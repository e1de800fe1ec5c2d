package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A portable Bloom filter built and probed entirely with codegen'd
  * builtin expressions — the manual spelling of Spark's runtime
  * row-level filtering, for when you want the filter *deterministic,
  * inspectable and reusable* (e.g. persisted beside a snapshot and
  * probed by later jobs) rather than an AQE heuristic.
  *
  * Shape: the filter is a 1-row DataFrame holding MAP<BIGINT, BIGINT>
  * (64-bit word index → word) — sparse, so memory tracks the number of
  * SET words, not `mBits`/64. Build = explode the k bit positions per
  * key, `bit_or` words, collect one map (two tiny exchanges over ≤
  * k·|build| position rows). Probe = crossJoin(broadcast(1 row)) + a
  * pure-expression membership test evaluated INSIDE the probe's scan
  * stage — no exchange, no UDF, whole-stage codegen.
  *
  * 100 TB rationale: a semi join whose build side fits in a broadcast
  * needs no bloom — Spark broadcasts the exact key set. The bloom earns
  * its keep when the build side is too big to broadcast (billions of
  * keys): the probe-side exchange of a shuffled semi join then carries
  * the FULL 100 TB probe, while this filter (fixed mBits — 16 KiB at
  * 2^17 — or sized m ≈ 10·n for ~1% fpr) cuts it to
  * selectivity + fpr map-side, before any shuffle. False positives are
  * removed by the exact join that follows, so composed results are
  * exact — which is also what makes the entry oracle-able.
  *
  * Hashing: both build and probe use the same Column-side
  * `xxhash64(key, i)` (i = 0..k−1 decorrelates the k probes), so there
  * is no JVM-vs-codegen hash-implementation pairing to keep in sync.
  */
object Bloom {

  /** 1-row frame with column `bloom`: MAP<BIGINT,BIGINT> of set words. */
  def buildBloom(keys: DataFrame, keyCol: String, mBits: Long, nHashes: Int): DataFrame = {
    val posCols = (0 until nHashes).map(i =>
      pmod(xxhash64(col(keyCol), lit(i)), lit(mBits)))
    keys.select(explode(array(posCols: _*)).as("pos"))
      .select(expr("pos div 64").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("b"))
      .groupBy("w").agg(expr("bit_or(b)").as("bits"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits")))).as("bloom"))
  }

  /** Membership predicate over Columns (the caller guarantees `key` is
    * BIGINT-typed and `bloom` holds the map). All builtins, so it
    * evaluates inside whole-stage codegen; the shared `pos` subtree per
    * probe is identical-by-construction, which codegen's subexpression
    * elimination collapses to one hash computation. Column parameters
    * (not name strings spliced into `expr()` SQL) so backtick-needing
    * names — dots, spaces, keywords — resolve like any other Column. */
  def mightContain(key: Column, bloom: Column, mBits: Long, nHashes: Int): Column =
    (0 until nHashes).map { i =>
      val pos = pmod(xxhash64(key, lit(i)), lit(mBits))
      // pos div 64 spelled as >> 6 (pos is non-negative by pmod);
      // shiftleft's bit count must be a Column here, which only the
      // call_function spelling admits
      val word = coalesce(element_at(bloom, shiftright(pos, 6)), lit(0L))
      val bit = call_function("shiftleft", lit(1L), (pos % lit(64L)).cast("int"))
      word.bitwiseAND(bit) =!= lit(0L)
    }.reduce(_ && _)

  /** Name-based convenience overload. */
  def mightContain(keyName: String, bloomName: String, mBits: Long, nHashes: Int): Column =
    mightContain(col(keyName), col(bloomName), mBits, nHashes)
}
