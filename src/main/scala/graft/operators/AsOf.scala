package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the feature-attachment primitive of
  * event/training pipelines: for each probe row, attach the single most
  * recent build row with the same key and build.time <= probe.time
  * (e.g. "the last click before this purchase", "the feature snapshot
  * in effect at label time").
  *
  * Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the naive
  * spellings collapse at scale: a range join (`b.time <= p.time`)
  * explodes to O(matches) rows then needs a per-probe max — quadratic
  * in events-per-key — and a correlated-subquery plan re-scans build
  * per probe row. The scalable composition is union + window:
  *
  *   1. tag both sides, pack each build row's payload into ONE struct
  *      (null-safety is atomic: a build row with a null payload field
  *      still matches, exactly like a join would),
  *   2. union by name (probe-only columns are null on build rows),
  *   3. per key, sort by (time, side) with build first on ties — the
  *      `>=` of ASOF semantics — and take `last(struct, ignoreNulls)`
  *      over rows UNBOUNDED PRECEDING..CURRENT,
  *   4. keep probe rows.
  *
  * ONE shuffle on the key, no row explosion, no re-scan; the sort is
  * per-key within partitions (Spark range-partitions the window sort),
  * so 100 TB of events spread over any number of executors with skew
  * bounded by the hottest key's row count — same exchange shape as the
  * groupBy the pipeline runs next anyway.
  *
  * Contract: `key` and `time` exist on both sides with identical
  * names/types; build's OTHER columns (the payload) must not collide
  * with probe columns; build should be unique per (key, time) —
  * duplicate build timestamps make "the most recent row" ambiguous in
  * any engine (DuckDB's ASOF picks one arbitrarily; pre-aggregate to
  * make it deterministic).
  *
  * Result: probe.* + `asof` struct (field `t` = matched build time,
  * then the payload fields), null when no build row precedes.
  */
object AsOf {
  def asofJoin(probe: DataFrame, build: DataFrame, key: String,
      time: String): DataFrame = {
    val payload = build.columns.filter(c => c != key && c != time).toSeq
    val b = build
      .withColumn("__asof", struct(col(time).as("t") +: payload.map(col): _*))
      .drop(payload: _*)
      .withColumn("__side", lit(0))
    val p = probe.withColumn("__side", lit(1))
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(b, allowMissingColumns = true)
      .withColumn("asof", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__asof")
  }

  /** FORWARD as-of join: attach the EARLIEST build row with
    * build.time >= probe.time ("the next quote after this trade", "the
    * first purchase after this click"). Same union+window composition
    * as [[asofJoin]], mirrored: probe sorts BEFORE build on time ties
    * (the `>=` tie matches), the frame looks forward
    * (CURRENT..UNBOUNDED FOLLOWING), and `first(ignoreNulls)` replaces
    * `last`. Identical scale shape: ONE shuffle on the key, no row
    * explosion. */
  def asofJoinForward(probe: DataFrame, build: DataFrame, key: String,
      time: String): DataFrame = {
    val payload = build.columns.filter(c => c != key && c != time).toSeq
    val b = build
      .withColumn("__asof", struct(col(time).as("t") +: payload.map(col): _*))
      .drop(payload: _*)
      .withColumn("__side", lit(1))
    val p = probe.withColumn("__side", lit(0))
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    p.unionByName(b, allowMissingColumns = true)
      .withColumn("asof", first(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .drop("__side", "__asof")
  }
}
