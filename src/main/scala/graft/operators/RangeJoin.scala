package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — "points t inside intervals [lo, hi)" — the
  * second temporal-join primitive (with [[AsOf]]) that event pipelines
  * need and Spark's join operators don't provide directly: Catalyst
  * plans `p.t >= i.lo AND p.t < i.hi` (plus any equi-key) as a
  * BroadcastNestedLoopJoin or a sort-merge join on the key alone with
  * the range as a post-filter — each key group degenerates to
  * points × intervals work, quadratic in events-per-key.
  *
  * The scalable composition is BUCKETING: pick a width W, replicate
  * each interval onto the ceil(span/W) buckets it covers, map each
  * point to its single bucket, equi-join on (key, bucket), then apply
  * the exact range predicate. Each (interval, point) pair can only
  * meet in the point's one bucket, so no dedup pass is needed. Cost is
  * ONE equi-shuffle with interval-side replication bounded by span/W —
  * tune W toward the typical span so the factor stays small (Flink's
  * interval join and Spark's own AQE-era range-join hints use the same
  * trick).
  *
  * Contract: `key` exists on both sides; `pointTime`/`lo`/`hi` are
  * LONG epoch offsets in the same unit (µs here — callers convert
  * timestamps via unix_micros, keeping the bucket arithmetic integer-
  * exact); hi is EXCLUSIVE; no other column names collide. Result:
  * inner-join rows (interval.* + point.*) — callers aggregate and
  * re-attach zero-match rows as the semantics require.
  */
object RangeJoin {
  def bucketedPointInterval(points: DataFrame, intervals: DataFrame,
      key: String, pointTime: String, lo: String, hi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // hi is exclusive: an interval touching a bucket only at its open
    // endpoint must not replicate there, hence (hi - 1) div W. Integer
    // `div`, not `/`: double division of epoch-µs magnitudes can round
    // a quotient across a bucket boundary.
    val i = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$lo div $bucketWidth"),
        expr(s"($hi - 1) div $bucketWidth"))))
    val p = points.withColumn("__bucket", expr(s"$pointTime div $bucketWidth"))
    i.join(p, Seq(key, "__bucket"))
      .filter(col(pointTime) >= col(lo) && col(pointTime) < col(hi))
      .drop("__bucket")
  }
}
