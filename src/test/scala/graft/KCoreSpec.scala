package graft

import graft.operators.KCore

/** [[KCore]] against hand-computed graphs (every degree and peel
  * traced below) plus invariants on the testdata trading graph. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def bidirect(und: Seq[(Long, Long)]) =
    (und ++ und.map(_.swap)).toDF("src", "dst")

  test("triangle + pendant at k=2: pendant peels, core is stable") {
    // 1-2-3 triangle, 4 hangs off 1. Degrees: 1→3, 2→2, 3→2, 4→1.
    // Round 1 removes 4; the triangle is the 2-core and never moves.
    val e = bidirect(Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)))
    val got = KCore.peelCensus(e, k = 2, rounds = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    got shouldBe Array((0L, 4L, 8L, 3L), (1L, 3L, 6L, 2L), (2L, 3L, 6L, 2L))
  }

  test("path graph at k=2: the peel CASCADES to empty") {
    // 1-2-3-4-5: endpoints peel, exposing new endpoints each round.
    val e = bidirect(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val got = KCore.peelCensus(e, k = 2, rounds = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    got shouldBe Array((0L, 5L, 8L, 2L), (1L, 3L, 4L, 2L),
      (2L, 0L, 0L, 0L), (3L, 0L, 0L, 0L))
  }

  test("testdata trading graph: monotone peel, bidirected parity") {
    val d = "/root/testdata/sf0.001"
    val pairs = Tables.tbl(spark, d, "lineitem")
      .where("l_quantity > 45")
      .selectExpr("l_orderkey", "l_suppkey")
      .join(Tables.tbl(spark, d, "orders")
        .selectExpr("o_orderkey", "o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .selectExpr("o_custkey AS a", "l_suppkey + 100000000 AS b")
      .distinct()
    val e = pairs.selectExpr("a AS src", "b AS dst")
      .union(pairs.selectExpr("b AS src", "a AS dst"))
    val got = KCore.peelCensus(e, k = 8, rounds = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    got.length shouldBe 4
    // node and edge counts never increase; directed rows are even
    // (every undirected edge contributes exactly 2 or 0 rows)
    got.sliding(2).foreach { case Array(p, n) =>
      n._2 should be <= p._2
      n._3 should be <= p._3
    }
    got.foreach { r => r._3 % 2 shouldBe 0L }
  }
}
