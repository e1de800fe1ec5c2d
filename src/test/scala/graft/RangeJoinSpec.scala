package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Hand-computed edges for the bucketed interval join — the cases the
  * j_range_bucketed oracle only hits if the data happens to: closed/open
  * endpoints, an interval spanning several buckets (replication must
  * not duplicate pairs), an interval ending exactly on a bucket
  * boundary, and key separation. Bucket width 10 throughout. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def run(points: Seq[(Long, Long)], intervals: Seq[(Long, String, Long, Long)]) = {
    val p = points.toDF("k", "t")
    val i = intervals.toDF("k", "name", "lo", "hi")
    RangeJoin.bucketedPointInterval(p, i, "k", "t", "lo", "hi", 10L)
      .select(col("name"), col("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(identity).toSeq
  }

  test("lo is inclusive, hi is exclusive") {
    val got = run(
      points = Seq((1L, 10L), (1L, 19L), (1L, 20L)),
      intervals = Seq((1L, "a", 10L, 20L)))
    got shouldBe Seq(("a", 10L), ("a", 19L))
  }

  test("interval spanning many buckets matches each point exactly once") {
    // [5, 35) covers buckets 0..3; points in distinct buckets and one
    // outside — replication must never produce duplicate pairs
    val got = run(
      points = Seq((1L, 5L), (1L, 14L), (1L, 29L), (1L, 34L), (1L, 35L)),
      intervals = Seq((1L, "wide", 5L, 35L)))
    got shouldBe Seq(("wide", 5L), ("wide", 14L), ("wide", 29L), ("wide", 34L))
  }

  test("interval ending exactly on a bucket boundary does not leak into the next bucket") {
    // [0, 20): (hi-1) div 10 = 1, so bucket 2 is never visited — a
    // naive hi div W would replicate there and rely on the filter only
    val got = run(
      points = Seq((1L, 20L), (1L, 25L)),
      intervals = Seq((1L, "edge", 0L, 20L)))
    got shouldBe Seq.empty
  }

  test("keys never mix and overlapping intervals each match") {
    val got = run(
      points = Seq((1L, 12L), (2L, 12L)),
      intervals = Seq((1L, "k1", 10L, 20L), (1L, "k1b", 0L, 40L), (2L, "k2", 10L, 20L)))
    got shouldBe Seq(("k1", 12L), ("k1b", 12L), ("k2", 12L))
  }
}
