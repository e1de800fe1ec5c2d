package graft

import org.apache.spark.sql.functions._

/** Hand-computable cases for the bucketed two-sample KS statistic and
  * its scale shape (fact-row windows are bucket-partitioned, never
  * global). Fixtures stage a tiny events.parquet the entry reads the
  * same way the gate does. */
class KsDriftSpec extends SparkSpec {
  import spark.implicits._

  private def stage(name: String, rows: Seq[(String, Double)]): String = {
    val dir = s"target/tmp/spec_$name"
    // Tables.tbl("events") probes the ts column for the nanos rebuild;
    // give the fixture the real table's shape (ts as nano-longs).
    rows.zipWithIndex.map { case ((t, v), i) => (1_700_000_000_000_000_000L + i, t, v) }
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ks(d: String): (Double, Long, Long) =
    QueriesAggWindow.gKsDrift.fn(spark, d)
      .as[(Double, Long, Long)].collect()(0)

  test("KS: disjoint-support shift gives the hand-computed D") {
    // click {1,2}, purchase {2,3}: F_a−F_b at x=1 is 1/2−0, at 2 is 1−1/2,
    // at 3 is 1−1 → D = 0.5
    val d = stage("ks1", Seq(
      ("click", 1.0), ("click", 2.0), ("purchase", 2.0), ("purchase", 3.0)))
    ks(d) shouldBe ((0.5, 2L, 2L))
  }

  test("KS: identical samples give D = 0; full separation gives D = 1") {
    val same = stage("ks2", Seq(
      ("click", 1.0), ("click", 5.0), ("purchase", 1.0), ("purchase", 5.0)))
    ks(same)._1 shouldBe 0.0
    val apart = stage("ks3", Seq(
      ("click", 1.0), ("click", 2.0), ("purchase", 100.0), ("purchase", 200.0)))
    ks(apart) shouldBe ((1.0, 2L, 2L))
  }

  test("KS: ties across samples and bucket boundaries agree with the global spelling") {
    // values straddle the width-10 buckets (9.9 vs 10.1) and tie at 10.1;
    // brute-force reference computed over the pooled distinct values
    val rows = Seq(
      ("click", 3.0), ("click", 9.9), ("click", 10.1), ("click", 25.0),
      ("purchase", 9.9), ("purchase", 10.1), ("purchase", 10.1), ("purchase", 30.0))
    val d = stage("ks4", rows)
    val (stat, na, nb) = ks(d)
    val a = rows.filter(_._1 == "click").map(_._2)
    val b = rows.filter(_._1 == "purchase").map(_._2)
    val brute = (a ++ b).distinct.map { x =>
      math.abs(a.count(_ <= x).toDouble / a.size - b.count(_ <= x).toDouble / b.size)
    }.max
    stat shouldBe (math.rint(brute * 1e6) / 1e6)
    (na, nb) shouldBe ((4L, 4L))
  }

  test("KS plan: fact-row windows are bucket-partitioned, not global") {
    val d = stage("ks5", Seq(("click", 1.0), ("purchase", 2.0)))
    val plan = QueriesAggWindow.gKsDrift.fn(spark, d)
      .queryExecution.executedPlan.toString
    withClue(plan) {
      plan should include("hashpartitioning(bkt")
    }
  }

  test("KS plan: ONE fact scan — totals branch reuses the cum exchange") {
    // asserted on the static plan (AQE's initial plan never displays
    // reuse; its runtime stage cache applies the same canonicalization)
    val d = stage("ks6", Seq(("click", 1.0), ("purchase", 2.0)))
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = QueriesAggWindow.gKsDrift.fn(spark, d)
        .queryExecution.executedPlan.toString
      withClue(plan) {
        "Scan parquet".r.findAllIn(plan).size shouldBe 1
        "ReusedExchange".r.findAllIn(plan).size shouldBe 1
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
