package graft

import graft.plans.TopKPerGroup
import org.apache.spark.sql.functions._

/** The custom per-group top-k operator (LogicalPlan + Strategy +
  * bounded-heap SparkPlan): brute-force equality, the no-sort plan
  * contract, bound edge cases, and clustering reuse downstream. */
class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    // skewed: group g holds 40·(g+1) rows; values collide across rows
    // so the tiebreak id is load-bearing
    val rows = for (g <- 0 until 6; i <- 0 until 40 * (g + 1))
      yield (g.toLong, (i * 2654435761L + g) % 97L, (g * 10000 + i).toLong)
    rows.toDF("g", "v", "id").repartition(7) // force a real exchange
  }

  test("matches the brute-force top-k under the total order") {
    val got = TopKPerGroup(fixture, Seq("g"), "v", descending = true, "id", 5)
      .orderBy("g", "id").as[(Long, Long, Long)].collect().toSeq
    val truth = fixture.as[(Long, Long, Long)].collect().toSeq
      .groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._2, r._3)).take(5)
      }.sortBy(r => (r._1, r._3))
    got shouldBe truth
  }

  test("plan: the custom node, ONE hash exchange, and NO sort anywhere") {
    val df = TopKPerGroup(fixture, Seq("g"), "v", descending = true, "id", 5)
    val p = df.queryExecution.executedPlan.toString
    withClue(p) {
      p should include("TopKPerGroup")
      // exactly the ENSURE_REQUIREMENTS exchange our distribution asks
      // for (the repartition(7) is round-robin, not hash)
      "- Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
      p should not include "Sort " // the whole point vs the window spelling
    }
  }

  test("k >= group size returns every row; ascending order supported") {
    val tiny = Seq((1L, 3L, 1L), (1L, 1L, 2L), (2L, 5L, 3L)).toDF("g", "v", "id")
    val got = TopKPerGroup(tiny, Seq("g"), "v", descending = false, "id", 10)
      .orderBy("g", "v").as[(Long, Long, Long)].collect().toSeq
    got shouldBe Seq((1L, 1L, 2L), (1L, 3L, 1L), (2L, 5L, 3L))
  }

  test("downstream groupBy on the key rides the operator's clustering") {
    val df = TopKPerGroup(fixture, Seq("g"), "v", descending = true, "id", 5)
      .groupBy("g").agg(count(lit(1)).as("n"))
    val p = df.queryExecution.executedPlan.toString
    withClue(p) {
      // the operator's required exchange and NOTHING for the groupBy:
      // outputPartitioning = child's hashpartitioning(g)
      "- Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
    }
    df.as[(Long, Long)].collect().toMap shouldBe Map(
      0L -> 5L, 1L -> 5L, 2L -> 5L, 3L -> 5L, 4L -> 5L, 5L -> 5L)
  }

  test("unknown column names are rejected") {
    an[IllegalArgumentException] should be thrownBy
      TopKPerGroup(fixture, Seq("nope"), "v", descending = true, "id", 3)
  }

  test("past the byte budget the exec degrades to the spillable sort, same rows") {
    // a 1-byte budget forces the fallback on the very first row, so the
    // whole partition runs through UnsafeExternalRowSorter + streaming
    // limit — results must be IDENTICAL to the heap path (total order)
    val key = graft.plans.TopKPerGroupExec.FallbackBytesKey
    val heapRows = TopKPerGroup(fixture, Seq("g"), "v", descending = true, "id", 5)
      .orderBy("g", "id").as[(Long, Long, Long)].collect().toSeq
    spark.conf.set(key, "1")
    try {
      val spillRows = TopKPerGroup(fixture, Seq("g"), "v", descending = true, "id", 5)
        .orderBy("g", "id").as[(Long, Long, Long)].collect().toSeq
      spillRows shouldBe heapRows
    } finally spark.conf.unset(key)
  }
}
