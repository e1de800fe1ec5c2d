package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The optimizer rewrite (window row_number → bounded-heap TopK):
  * fires exactly on the discard-the-rank idiom, never elsewhere, and
  * produces the same rows with no Sort and no Window in the plan. */
class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val rows = for (g <- 0 until 5; i <- 0 until 30)
      yield (g.toLong, (i * 2654435761L + g) % 53L, (g * 1000 + i).toLong)
    rows.toDF("g", "v", "id").repartition(5)
  }

  private val w = Window.partitionBy("g")
    .orderBy(col("v").desc, col("id").asc)

  test("discard-the-rank idiom rewrites: no Window, no Sort, same rows") {
    val q = fixture.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 4).drop("rn")
    val opt = q.queryExecution.optimizedPlan.toString
    val phys = q.queryExecution.executedPlan.toString
    withClue(opt + "\n" + phys) {
      opt should include("TopKPerGroup")
      phys should not include "Window"
      phys should not include "Sort "
    }
    val got = q.orderBy("g", "id").as[(Long, Long, Long)].collect().toSeq
    val truth = fixture.as[(Long, Long, Long)].collect().toSeq
      .groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._2, r._3)).take(4)
      }.sortBy(r => (r._1, r._3))
    got shouldBe truth
  }

  test("strict < spells k-1") {
    val q = fixture.withColumn("rn", row_number().over(w))
      .where(col("rn") < 3).drop("rn")
    q.queryExecution.optimizedPlan.toString should include("TopKPerGroupNode 2,")
    q.count() shouldBe 10 // 2 per group x 5 groups
  }

  test("LATERAL correlated ORDER BY ... LIMIT k fires via decorrelation (r14, VERDICT r13 #7)") {
    // the other universal spelling: Spark's DecorrelateInnerQuery turns
    // the correlated LIMIT into exactly the row_number window + filter
    // idiom, so the EXISTING rule covers it with no extra trigger —
    // pinned here so a decorrelation change that breaks the handoff
    // turns a test red instead of silently re-planning a full Window
    fixture.createOrReplaceTempView("tkr_lateral_t")
    val q = spark.sql(
      """SELECT d.g, l.v, l.id FROM
        |  (SELECT DISTINCT g FROM tkr_lateral_t) d,
        |  LATERAL (SELECT v, id FROM tkr_lateral_t t
        |           WHERE t.g = d.g ORDER BY v DESC, id ASC LIMIT 4) l""".stripMargin)
    val opt = q.queryExecution.optimizedPlan.toString
    withClue(opt) {
      opt should include("TopKPerGroup")
      opt should not include "windowspecdefinition"
    }
    val got = q.orderBy("g", "id").as[(Long, Long, Long)].collect().toSeq
    val truth = fixture.as[(Long, Long, Long)].collect().toSeq
      .groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._2, r._3)).take(4)
      }.sortBy(r => (r._1, r._3))
    got shouldBe truth
  }

  test("kept rank column blocks the rewrite — the Window must stay") {
    val q = fixture.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 4) // rn still in the output
    val opt = q.queryExecution.optimizedPlan.toString
    withClue(opt) {
      opt should not include "TopKPerGroup"
      opt should include("windowspecdefinition")
    }
  }

  // ties fixture: v = i/3 plants 3-way order-key ties in every group,
  // including across the k boundary, so rank()<=k keeps MORE than k rows
  private def tieFixture = {
    val rows = for (g <- 0 until 4; i <- 0 until 24)
      yield (g.toLong, (i / 3).toLong, (g * 1000 + i).toLong)
    rows.toDF("g", "v", "id").repartition(3)
  }

  private def rankTruth(k: Int): Seq[(Long, Long, Long)] =
    tieFixture.as[(Long, Long, Long)].collect().toSeq
      .groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        val sorted = rs.sortBy(r => -r._2)
        val boundary = sorted(k - 1)._2
        sorted.filter(_._2 >= boundary) // rank()<=k == all rows at/above the k-th key
      }.sortBy(r => (r._1, -r._2, r._3))

  test("rank() rewrites to the ties-kept policy: same rows as the Window, more than k") {
    val q = tieFixture.withColumn("rn", rank().over(
        Window.partitionBy("g").orderBy(col("v").desc)))
      .where(col("rn") <= 4).drop("rn")
    val opt = q.queryExecution.optimizedPlan.toString
    val phys = q.queryExecution.executedPlan.toString
    withClue(opt + "\n" + phys) {
      opt should include("TopKPerGroup")
      opt should include("true") // withTies printed in the node args
      phys should not include "Window"
      phys should not include "Sort "
    }
    val got = q.orderBy(col("g"), col("v").desc, col("id"))
      .as[(Long, Long, Long)].collect().toSeq
    val truth = rankTruth(4)
    withClue(s"got=${got.size} truth=${truth.size}") { got shouldBe truth }
    // the boundary tie genuinely bites: more rows than k per group
    got.size should be > 4 * 4
  }

  test("rank ties survive the byte-budget fallback path identically") {
    spark.conf.set(graft.plans.TopKPerGroupExec.FallbackBytesKey, "64")
    try {
      val q = tieFixture.withColumn("rn", rank().over(
          Window.partitionBy("g").orderBy(col("v").desc)))
        .where(col("rn") <= 4).drop("rn")
      val got = q.orderBy(col("g"), col("v").desc, col("id"))
        .as[(Long, Long, Long)].collect().toSeq
      got shouldBe rankTruth(4)
    } finally spark.conf.unset(graft.plans.TopKPerGroupExec.FallbackBytesKey)
  }

  test("dense_rank() still blocks the rewrite — its limit counts distinct keys") {
    val q = fixture.withColumn("rn", dense_rank().over(w))
      .where(col("rn") <= 4).drop("rn")
    q.queryExecution.optimizedPlan.toString should not include "TopKPerGroup"
  }

  test("kept rank() column blocks the rewrite like kept row_number") {
    val q = fixture.withColumn("rn", rank().over(w))
      .where(col("rn") <= 4) // rn still in the output
    q.queryExecution.optimizedPlan.toString should not include "TopKPerGroup"
  }

  test("a second window expression blocks the rewrite") {
    val q = fixture
      .withColumn("rn", row_number().over(w))
      .withColumn("mx", max(col("v")).over(Window.partitionBy("g")))
      .where(col("rn") <= 4).drop("rn")
    q.queryExecution.optimizedPlan.toString should not include "TopKPerGroup"
  }

  test("compound filter blocks the rewrite (conservative by design)") {
    val q = fixture.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 4 && col("v") > 10).drop("rn")
    q.queryExecution.optimizedPlan.toString should not include "TopKPerGroup"
  }

  test("the conf kill switch restores the stock Window plan") {
    spark.conf.set(graft.plans.TopKRewrite.EnabledKey, "false")
    try {
      val q = fixture.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 4).drop("rn")
      val opt = q.queryExecution.optimizedPlan.toString
      withClue(opt) {
        opt should not include "TopKPerGroup"
        opt should include("Window")
      }
    } finally spark.conf.unset(graft.plans.TopKRewrite.EnabledKey)
  }
}
