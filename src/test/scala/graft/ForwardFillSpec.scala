package graft

import org.apache.spark.sql.functions._

/** forwardFillScalable must equal the naive global fill on every input
  * shape: nulls crossing bucket boundaries, leading nulls, all-null
  * buckets, and an all-null column. */
class ForwardFillSpec extends SparkSpec {
  import spark.implicits._

  private def check(rows: Seq[(Long, Option[Double])], nBuckets: Int): Unit = {
    val df = rows.toDF("k", "v").repartition(4)
    val want = Ingest.forwardFill(df, "v", "k")
      .orderBy("k").select("k", "v").collect().toSeq
    val got = Ingest.forwardFillScalable(df, "v", "k", nBuckets)
      .orderBy("k").select("k", "v").collect().toSeq
    got shouldBe want
  }

  test("equals global fill: nulls across bucket boundaries") {
    // 40 rows, 8 buckets of 5; nulls straddle boundaries
    val rows = (0L until 40L).map(k =>
      (k, if (k % 3 == 0) Some(k.toDouble) else None))
    check(rows, 8)
  }

  test("equals global fill: leading nulls stay null") {
    val rows = Seq((0L, None), (1L, None), (2L, Some(5.0)), (3L, None))
    check(rows.map { case (k, v) => (k, v) }, 2)
  }

  test("equals global fill: entire buckets of nulls carry across") {
    // bucket 1 (keys 10..19) all null -> carried from bucket 0's last
    val rows = (0L until 30L).map(k =>
      (k, if (k < 10 && k % 2 == 0) Some(k.toDouble) else None))
    check(rows, 3)
  }

  test("all-null column survives") {
    check((0L until 10L).map(k => (k, Option.empty[Double])), 4)
  }

  test("null order keys are kept, not dropped") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("v", DoubleType, nullable = true)))
    val rows = Seq(Row(null, null), Row(1L, 10.0), Row(2L, null), Row(null, 5.0))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Ingest.forwardFillScalable(df, "v", "k", 4)
    out.count() shouldBe 4 // every row survives, incl. null keys
    // non-null-key rows behave exactly like the naive fill
    out.where(col("k") === 2L).select("v").head().getDouble(0) shouldBe 10.0
  }

  test("randomized sweep: random null patterns, sparse keys, bucket counts") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      val n = 50 + rnd.nextInt(150)
      // sparse, non-contiguous keys exercise the range bucketing
      val keys = Seq.fill(n)(rnd.nextLong().abs % 1000000L).distinct.sorted
      val rows = keys.map(k =>
        (k, if (rnd.nextDouble() < 0.6) None else Some(rnd.nextDouble())))
      check(rows, 1 + rnd.nextInt(16))
    }
  }

  test("the data-path window is partitioned by bucket, not global") {
    val df = (0L until 100L).map(k => (k, Some(k.toDouble))).toDF("k", "v")
    val plan = Ingest.forwardFillScalable(df, "v", "k", 8)
      .queryExecution.executedPlan.toString
    // the fill window over the data must carry the bucket partition key
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    withClue(plan) {
      specs.exists(_.contains("__b")) shouldBe true
      // the only unpartitioned spec is the nBuckets-row carry window
      // (its frame ends at -1, the running-carry signature)
      specs.filterNot(_.contains("__b")).foreach(s => s should include("-1"))
    }
  }
}
