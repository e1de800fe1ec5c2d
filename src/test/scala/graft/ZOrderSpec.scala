package graft

import org.apache.spark.sql.functions._

/** zorder2 native expression: bit-level ground truth against a Scala
  * model, known landmark values, and the locality property that makes
  * the key useful as a layout sort. Evaluation goes through a
  * DataFrame, i.e. the codegen path the gate uses. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def model(x: Long, y: Long): Long = {
    val xm = x & 0xffffL; val ym = y & 0xffffL
    (0 until 16).foldLeft(0L) { (z, i) =>
      z | (((xm >> i) & 1L) << (2 * i)) | (((ym >> i) & 1L) << (2 * i + 1))
    }
  }

  private def z(pairs: Seq[(Long, Long)]): Seq[Long] =
    pairs.toDF("x", "y")
      .select(call_function("zorder2", col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq

  test("landmark values and mask semantics") {
    z(Seq((3L, 0L), (0L, 3L), (65535L, 65535L), (65536L, 0L), (5L, 5L))) shouldBe
      Seq(5L, 10L, 0xffffffffL, 0L /* bit 16 masked */, model(5, 5))
  }

  test("integral coercion: INT literals from SQL (and both eval paths) work") {
    // a SQL user writes zorder2(3, 5) — INT literals, interpreted path
    spark.sql("SELECT zorder2(3, 5) AS z").as[Long].head() shouldBe model(3, 5)
    // mixed int/long columns through the codegen path
    Seq((3, 5L)).toDF("x", "y")
      .select(call_function("zorder2", col("x"), col("y")).as("z"))
      .as[Long].head() shouldBe model(3, 5)
    // non-integral still rejected
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT zorder2(1.5, 2)").collect()
    }
  }

  test("matches the bit model on random 16-bit pairs") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(200)((rnd.nextLong().abs % 65536, rnd.nextLong().abs % 65536))
    z(pairs) shouldBe pairs.map { case (a, b) => model(a, b) }
  }

  test("locality: points in a small tile sort contiguously within their quadrant") {
    // all points with x,y < 256 have zkey < 65536; any point with
    // x >= 256 or y >= 256 has zkey >= 65536 — tiles nest, which is
    // exactly why min/max stats on a zorder-sorted file prune both cols
    val inTile = for (x <- 0L until 256L by 17; y <- 0L until 256L by 23) yield model(x, y)
    all(inTile) should be < 65536L
    model(256, 0) should be >= 65536L
    model(0, 256) should be >= 65536L
  }
}
