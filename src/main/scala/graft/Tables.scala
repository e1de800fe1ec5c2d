package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table access + oracle-determinism helpers.
  *
  * Scale notes (100 TB design intent):
  *  - Readers return lazy DataFrames; column pruning / predicate pushdown
  *    reach the parquet scan because every query projects/filters on the
  *    DataFrame before any action.
  *  - Nothing here collects to the driver.
  *
  * Oracle-determinism: the driver hash-compares our parquet output against
  * DuckDB running `SparkEntry.oracleSql` on the same tables. Double
  * aggregation is order-sensitive (parallel sums differ in last ulps), so:
  *  - money/quantity style SUM/AVG go through exact DECIMAL arithmetic and
  *    are cast back to DOUBLE at the end (exact: all magnitudes < 2^53);
  *  - per-row float math is rounded to 6 decimals (both engines see
  *    identical IEEE-754 inputs, so rounding is stable);
  *  - every query ORDER BYs a total (tie-broken) key.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** events.parquet has shipped `ts` in two physical forms across
    * testdata generations: TIMESTAMP(NANOS) (no native Spark type; the
    * session sets spark.sql.legacy.parquet.nanosAsLong and we rebuild a
    * micros timestamp — integer `div`, a double divide would lose
    * precision on ~1e18 nano values) and TIMESTAMP(MICROS) without UTC
    * adjustment, which Spark reads as TIMESTAMP_NTZ. Both normalize to
    * session-TZ TimestampType here — the session TZ is pinned UTC, so
    * the NTZ→instant cast is unambiguous and DuckDB (which reads the
    * same file as a plain timestamp) sees identical instants. Every
    * downstream unix_micros()/withWatermark() relies on this one spot. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Base-table SCHEMA cache: `spark.read.parquet` re-reads footers to
    * infer the schema on EVERY call, and the suite resolves each base
    * table hundreds of times per bench run (180 entries × 2 passes ×
    * 1-3 tables). Caching the inferred StructType — keyed (dir, table),
    * value REPLACED when [[dataVer]] changes so a testdata regen
    * retargets — lets every later call resolve via `read.schema(...)`
    * with zero footer IO. Deliberately NOT a DataFrame cache: a
    * plan-valued cache would strongly retain every session that ever
    * resolved a table (each per-entry isolated streaming session, each
    * superseded version) for the JVM lifetime; a schema is a few
    * hundred bytes with no session reference. Schemas are JVM-stable
    * across sessions here because every builder pins the same parquet
    * confs (nanosAsLong, session TZ). */
  private val tblSchemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), (String, org.apache.spark.sql.types.StructType)]()

  def tbl(spark: SparkSession, dir: String, name: String): DataFrame = {
    val ver = dataVer(dir, name)
    val path = s"$dir/$name.parquet"
    val schema = tblSchemaCache.compute((dir, name), (_, cur) =>
      if (cur != null && cur._1 == ver) cur
      else (ver, spark.read.parquet(path).schema))._2
    val df = spark.read.schema(schema).parquet(path)
    if (name == "events") normalizeTs(df) else df
  }

  /** sf-conditional oracle-tractability sample (VERDICT r11 #2): the
    * three entries whose DuckDB ORACLE is O(N²) — dd_minhash_lsh,
    * st_stream_minhash (all-pairs Jaccard truth) and j_fuzzy_edit
    * (exact levenshtein cross join) — restrict BOTH engines to ids ≡ 0
    * (mod ceil(n/cap)), so the truth stays quadratic-in-a-bounded-
    * sample at any SF instead of quadratic-in-the-corpus (the r11
    * sf0.3 rehearsal: >55 CPU-min and counting on the unsampled
    * all-pairs oracle). At the shipped SFs n ≤ cap, so k = 1 and the
    * frame is returned UNTOUCHED — identical plan, identical hash;
    * above cap both sides shrink by the same deterministic predicate.
    * The count comes from [[tableCount]] — a driver-side footer-only
    * scan returning one long (metadata-sized by construction), MEMOIZED
    * per (dir, table) and re-read only when [[dataVer]] changes: the
    * r12 shape ran the count action at plan-construction time on every
    * entry invocation, and a corpus regenerated between two in-run
    * counts could have sampled different id sets than the oracle's
    * independent count(*) (r12 ADVICE, closed). The matching oracle
    * spelling is `id % ((SELECT (count(*) + cap - 1) // cap FROM t))
    * = 0` — the sampled-side OPERATORS are bucketed and scale-safe;
    * the sample bounds the oracle's cost, not the plan's. */
  private[graft] def modSample(df: DataFrame, idCol: String, cap: Long,
      n: Long): DataFrame = {
    val k = (n + cap - 1) / cap
    if (k <= 1) df else df.where(pmod(col(idCol), lit(k)) === 0)
  }

  /** Memoized base-table row count, keyed (dir, table), value replaced
    * when [[dataVer]] changes — the [[tblSchemaCache]] discipline.
    * Parquet count() is footer metadata, but it is still a Spark ACTION;
    * entries calling it at plan-construction time paid one job per
    * invocation and raced a mid-run testdata regen. */
  private val tblCountCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), (String, Long)]()

  private[graft] def tableCount(spark: SparkSession, dir: String,
      name: String): Long = {
    val ver = dataVer(dir, name)
    // get-then-put, NOT compute(): a count() is a distributed job and
    // CHM's contract requires mapping functions to be short — compute
    // would hold the bin lock for the whole job, blocking concurrent
    // callers on colliding keys (r13 ADVICE). Racing duplicates are
    // harmless: both compute the same value for the same ver.
    val key = (dir, name)
    val cur = tblCountCache.get(key)
    if (cur != null && cur._1 == ver) cur._2
    else {
      val v = (ver, tbl(spark, dir, name).count())
      tblCountCache.put(key, v)
      v._2
    }
  }

  /** Memoized max of a key column — [[tableCount]]'s twin, same
    * get-then-put discipline. Exists for DATA-DERIVED key lifts: an
    * entry that plants "new" rows at `key + CONSTANT` stops being
    * injective the moment a bigger corpus reaches the constant (the
    * r14 sf1.0 rehearsal: o_upsert/o_cdc_apply's +1e6/+2e6 plants
    * landed on the 10× corpus's real custkeys, and the collision
    * tie-breaks diverged between engines). Lifting by a multiple of
    * the constant ABOVE max(key) keeps the plant injective at every
    * SF and is the identity at shipped SFs (max < constant there);
    * the oracle replays it as a scalar subquery. Parquet max(col) is
    * footer metadata — cheap, but still an action, hence the memo. */
  private val tblMaxCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), (String, Long)]()

  private[graft] def tableMax(spark: SparkSession, dir: String,
      name: String, column: String): Long = {
    val ver = dataVer(dir, name)
    val key = (dir, name, column)
    val cur = tblMaxCache.get(key)
    if (cur != null && cur._1 == ver) cur._2
    else {
      val v = (ver, tbl(spark, dir, name)
        .agg(org.apache.spark.sql.functions.max(column)).head().getLong(0))
      tblMaxCache.put(key, v)
      v._2
    }
  }

  /** Data-version token for derived-fixture cache keys: mtime+length of
    * the source parquet files. Folding this into every `target/tmp`
    * fixture path makes a regenerated testdata dir retarget the cache
    * instead of serving stale bytes against a fresh oracle (the r8
    * near-miss: fixtures survived a testdata rewrite on key alone). */
  def dataVer(dir: String, names: String*): String = {
    val sig = names.sorted.map { n =>
      val f = new java.io.File(s"$dir/$n.parquet")
      s"$n:${f.lastModified}:${f.length}"
    }.mkString(";")
    (scala.util.hashing.MurmurHash3.stringHash(sig) & 0x7fffffff).toHexString
  }

  /** Reap SUPERSEDED fixture cache dirs: same family prefix, different
    * version suffix — the dirs a testdata regen (new [[dataVer]]) or a
    * formula bump orphans under target/tmp. Without this, every regen
    * leaks the full fixture footprint forever. Only dirs untouched for
    * an hour are removed (same guard as the bucketed-table reaper): a
    * CONCURRENT process on the same key set writes the same new name,
    * and nothing legitimately reads an hour-cold dir whose source
    * changed. Call right before using `keep`. */
  /** THE derived-fixture path contract, in one place (r10 review: four
    * near-identical inline copies meant a layout change needed four
    * edits): `target/tmp/<family>_<dirslug>_<ver>` — family-first so
    * superseded versions share a stable reapable prefix, version LAST
    * so a testdata regen / formula bump orphans (and [[reapStaleSiblings]]
    * reaps) the old dir. Callers own the build/load step; this owns
    * naming + reap. */
  private[graft] def fixturePath(family: String, d: String, ver: String): String = {
    val fam = family + "_" + d.replaceAll("[^0-9a-zA-Z]", "_") + "_"
    val name = fam + ver
    reapStaleSiblings(fam, name)
    "target/tmp/" + name
  }

  private[graft] def reapStaleSiblings(prefix: String, keep: String): Unit = {
    val base = new java.io.File("target/tmp")
    val staleMs = System.currentTimeMillis() - 3600L * 1000
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    Option(base.listFiles()).foreach(_.filter(f =>
      // the pre-dataVer generation named dirs exactly the family (no
      // version suffix) — `startsWith(prefix)` alone never matched
      // them (r9 advice), leaking one dir per family forever
      (f.getName.startsWith(prefix) || f.getName == prefix.stripSuffix("_")) &&
        f.getName != keep && f.lastModified() < staleMs)
      .foreach(rm))
  }

  /** One-time reap of LEGACY fixture layouts that no current prefix can
    * match: the ensemble family's pre-r10 ver-FIRST names
    * (`part_sink_<8hex>_<dirslug>`; r10 renamed them family-first so
    * [[reapStaleSiblings]] works). Same hour-cold guard. Called from
    * Verify/Bench setup (untimed); cheap no-op once clean. */
  private[graft] def reapLegacyFixtures(): Unit = {
    val base = new java.io.File("target/tmp")
    val staleMs = System.currentTimeMillis() - 3600L * 1000
    val legacy =
      "^(part_sink|schema_evo|csv_rt|csv_prov|fold_stack)_[0-9a-f]{1,8}_.*".r
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    Option(base.listFiles()).foreach(_.filter(f =>
      legacy.matches(f.getName) && f.lastModified() < staleMs)
      .foreach(rm))
  }

  /** Exact sum of a ~2-decimal double column: cast to DECIMAL (exact in
    * both Spark and DuckDB for clean inputs), sum without float error,
    * back to DOUBLE. `scale` must cover the data's true decimal scale. */
  def dsum(c: Column, scale: Int = 2, prec: Int = 18): Column =
    sum(c.cast(DecimalType(prec, scale))).cast("double")

  /** Exact avg built from dsum / count — final division is one IEEE op on
    * identical operands in both engines. */
  def davg(c: Column, scale: Int = 2): Column =
    (dsum(c, scale) / count(c)).cast("double")

  /** Exact sum of a product of two ~2-decimal doubles (scale 4 product). */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(DecimalType(18, 2)) * b.cast(DecimalType(18, 2))).cast("double")

  /** DuckDB SQL spellings of the same helpers (kept adjacent so the two
    * stay in sync). */
  def sqlDsum(e: String, scale: Int = 2): String =
    s"CAST(sum(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE)"
  def sqlDavg(e: String, scale: Int = 2): String =
    s"(CAST(sum(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE) / count($e))"
  def sqlDsumProd(a: String, b: String): String =
    s"CAST(sum(CAST($a AS DECIMAL(18,2)) * CAST($b AS DECIMAL(18,2))) AS DOUBLE)"
}
