package graft

import graft.operators.LabelProp

/** [[LabelProp.labelPropagate]] against a driver-side synchronous
  * replay: most-frequent in-neighbor label, smallest label on ties,
  * identity start. The tie cases matter most — a wrong tie order (or an
  * asynchronous update leaking a same-round label) diverges from the
  * replay on the very first round. */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private def replay(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val in = edges.distinct.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = nodes.map { n =>
        in.get(n) match {
          case None => n -> lab(n)
          case Some(srcs) =>
            val freq = srcs.groupBy(lab).view.mapValues(_.size).toSeq
            n -> freq.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    lab
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    LabelProp.labelPropagate(edges.toDF("src", "dst"), rounds)
      .as[(Long, Long)].collect().toMap

  private def bidirect(e: Seq[(Long, Long)]): Seq[(Long, Long)] =
    e ++ e.map(_.swap)

  test("two triangles joined by a bridge settle into their min labels") {
    val e = bidirect(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)))
    for (r <- 1 to 3) run(e, r) shouldBe replay(e, r)
  }

  test("tie on counts resolves to the smallest label (star with equal arms)") {
    // center 5 hears labels {1,2,3,4} once each → must adopt 1
    val e = bidirect(Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)))
    val got = run(e, 1)
    got(5L) shouldBe 1L
    got shouldBe replay(e, 1)
  }

  test("synchronous rounds: a chain propagates one hop per round, not more") {
    val e = bidirect(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    for (r <- 1 to 4) run(e, r) shouldBe replay(e, r)
  }

  test("directed edges only: a sink with no in-edges keeps its own label") {
    val e = Seq((1L, 2L), (2L, 3L)) // no edges INTO 1
    val got = run(e, 2)
    got(1L) shouldBe 1L
    got shouldBe replay(e, 2)
  }

  test("duplicate edges do not double-vote") {
    val e = Seq((1L, 5L), (1L, 5L), (1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L))
    // dedup'd: 5 hears {1,2,3,4} once each → ties → adopts 1; with
    // triple-counting it would also be 1, so vote with a decoy where
    // dup-counting flips the result: 9 votes twice for label 8
    val e2 = Seq((8L, 7L), (8L, 7L), (6L, 7L)) // dedup'd: tie {8,6} → 6
    run(e2, 1)(7L) shouldBe 6L
    run(e, 1)(5L) shouldBe 1L
  }
}
