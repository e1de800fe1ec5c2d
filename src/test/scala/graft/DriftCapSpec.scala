package graft

import org.apache.spark.sql.functions._

/** Hand-computable cases for g_chi2_drift (2×k contingency identity)
  * and pl_domain_cap (two-stage salted top-K ≡ single-window truth). */
class DriftCapSpec extends SparkSpec {
  import spark.implicits._

  // 2021-01-01T12:00Z (odd day) / 2021-01-02T12:00Z (even day) in nanos
  private val day1 = 1609502400L * 1000000000L
  private val day2 = 1609588800L * 1000000000L

  private def stageEvents(name: String, rows: Seq[(Long, String)]): String = {
    val dir = s"target/tmp/spec_$name"
    rows.zipWithIndex.map { case ((ts, t), i) =>
      (i.toLong, ts, i.toLong % 5, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("chi2: 2x2 table [[3,1],[1,3]] gives the closed-form N(ad-bc)^2/(r1 r2 c1 c2) = 2") {
    val d = stageEvents("chi1",
      Seq.fill(3)((day1, "A")) ++ Seq((day1, "B")) ++
        Seq((day2, "A")) ++ Seq.fill(3)((day2, "B")))
    val (chi2, dof, n) = QueriesAggWindow.gChi2Drift.fn(spark, d)
      .as[(Double, Long, Long)].collect()(0)
    chi2 shouldBe 2.0
    dof shouldBe 1L
    n shouldBe 8L
  }

  test("chi2: a category VANISHING in one period contributes its o=0 cell") {
    // the r6 advisor case: B occurs only on the odd day, so the dense
    // table carries (even, B) with o=0 and its term (o−e)²/e = r·c/N.
    // A: 2 odd + 2 even; B: 4 odd + 0 even → margins r=(6,2), c=(4,4),
    // N=8 → χ² = 1/3 + 1 + 1/3 + 1 = 8/3. The pre-densification code
    // dropped the (even, B) cell and understated this as 5/3.
    val d = stageEvents("chi3v",
      Seq.fill(2)((day1, "A")) ++ Seq.fill(4)((day1, "B")) ++
        Seq.fill(2)((day2, "A")))
    val (chi2, dof, n) = QueriesAggWindow.gChi2Drift.fn(spark, d)
      .as[(Double, Long, Long)].collect()(0)
    chi2 shouldBe (8.0 / 3.0 +- 1e-6)
    dof shouldBe 1L
    n shouldBe 8L
  }

  test("chi2: identical per-period distributions give exactly 0") {
    val d = stageEvents("chi2z",
      Seq((day1, "A"), (day1, "B"), (day2, "A"), (day2, "B")))
    QueriesAggWindow.gChi2Drift.fn(spark, d)
      .as[(Double, Long, Long)].collect()(0)._1 shouldBe 0.0
  }

  private def lcg(id: Long): Long =
    ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L

  private def stageDocs(name: String, ids: Seq[(Long, String)]): String = {
    val dir = s"target/tmp/spec_$name"
    ids.map { case (id, src) => (id, s"t$id", "en", src, 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("domain cap: two-stage salted top-K equals the single-window truth on a skewed domain") {
    val ids = (0L until 100L).map((_, "big")) ++ Seq(500L, 501L, 502L).map((_, "small"))
    val d = stageDocs("cap1", ids)
    val got = QueriesPipeline.plDomainCap.fn(spark, d)
      .select("source", "rn", "doc_id")
      .as[(String, Int, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    // brute-force truth: K smallest (lcg, id) per domain, ranked
    val want = ids.groupBy(_._2).toSeq.flatMap { case (src, docs) =>
      docs.map(_._1).sortBy(id => (lcg(id), id)).take(15)
        .zipWithIndex.map { case (id, i) => (src, i + 1, id) }
    }.sortBy(r => (r._1, r._2))
    got shouldBe want
    got.count(_._1 == "big") shouldBe 15
    got.count(_._1 == "small") shouldBe 3
  }

  test("domain cap plan: salted stage-1 runs sort-free, stage-2 window re-ranks") {
    val d = stageDocs("cap2", (0L until 40L).map((_, "x")))
    val plan = QueriesPipeline.plDomainCap.fn(spark, d)
      .queryExecution.executedPlan.toString
    withClue(plan) {
      // stage 1 discards its rank, so TopKRewrite swaps the salted
      // window for the bounded-heap operator (no sort); stage 2 keeps
      // rn in the output, so it stays a real Window
      plan should include("TopKPerGroup")
      "\\bWindow\\b".r.findAllIn(plan).size shouldBe 1
      plan should include("salt")
    }
  }
}
