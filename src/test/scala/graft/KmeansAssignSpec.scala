package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Nearest-centroid assignment: brute-force ground truth on a small
  * random set, and the deterministic lower-cid tie-break the gate's
  * total-order contract depends on. */
class KmeansAssignSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("assignment equals brute-force argmin over random vectors") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 50L).map(i => i -> Seq.fill(8)(rnd.nextFloat()))
    val cents = vecs.take(4).map { case (id, v) => (id, v.map(_.toDouble)) }
    val expected = vecs.map { case (id, v) =>
      val d = cents.map { case (cid, cv) =>
        (v.map(_.toDouble).zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min // (d2, cid) lexicographic: ties break to the lower cid
      (id, d._2)
    }
    val got = Similarity.kmeansAssign(df(vecs),
        df(cents.map { case (id, v) => (id, v.map(_.toFloat)) })
          .select(col("vec_id").as("cid"), col("embedding").cast("array<double>").as("cv")))
      .select("vec_id", "cluster").as[(Long, Long)].collect().sortBy(_._1).toSeq
    got shouldBe expected.sortBy(_._1)
  }

  test("equidistant centroids break ties to the lower cid") {
    // probe at the origin midpoint of two mirror centroids: d2 identical
    val vecs = df(Seq((100L, Seq(0.0f, 0.0f))))
    val cents = Seq((5L, Seq(1.0, 0.0)), (2L, Seq(-1.0, 0.0)))
      .toDF("cid", "cv")
    val r = Similarity.kmeansAssign(vecs, cents)
      .select("cluster").as[Long].collect()
    r.toSeq shouldBe Seq(2L)
  }
}
