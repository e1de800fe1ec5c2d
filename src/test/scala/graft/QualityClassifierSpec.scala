package graft

import org.apache.spark.sql.Row

/** Numeric surface of `pl_quality_classifier` (the hashed entry folds
  * the trained metrics into its `quality_ok` gate; the actual values
  * are pinned here, the mlCvLogloss/MlPipelineSpec division of labor).
  * The planted label (≥ 2 'join' tokens) is balanced (~51% positive)
  * and a deterministic function of the token counts the featurizer
  * hashes, so the classifier must recover it decisively — far inside
  * the entry's gates (accuracy > 0.9, log-loss < 0.3). */
class QualityClassifierSpec extends SparkSpec {

  test("in-engine quality classifier recovers the planted label decisively") {
    val r: Row = QueriesMl
      .qualityClassifierMetrics(spark, "/root/testdata/sf0.001")
      .collect()(0)
    info(s"metrics row: $r")
    r.getAs[Long]("n_docs") shouldBe 500L
    r.getAs[Long]("n_train") shouldBe 400L
    r.getAs[Long]("n_test") shouldBe 100L
    r.getAs[Long]("n_pos") shouldBe 255L
    val acc = r.getAs[Double]("test_accuracy")
    val ll = r.getAs[Double]("test_logloss")
    // gates in the entry are 0.9 / 0.3; the pins here hold the real
    // margin so gate drift is visible before it threatens the gate
    acc should be >= 0.97
    ll should be <= 0.15
    r.getAs[Boolean]("quality_ok") shouldBe true
  }

  test("label token's HashingTF bucket is collision-free on the current fixture vocabulary") {
    // The invariant the classifier's linear separability rides on
    // (r15 ADVICE #1 / VERDICT r15 #7): the planted label counts 'join'
    // tokens, and the count features can express it exactly only while
    // no OTHER fixture token hashes into 'join's D=1024 bucket — a
    // collision adds a confound the LR cannot subtract and the gate
    // margin erodes silently. Assert it LOUD, per scale the gates run
    // at: every distinct token sharing the bucket must BE the label
    // token. The vocab is bounded (synthetic fixture text), so the
    // driver-side indexOf sweep is O(vocab), not O(corpus).
    import org.apache.spark.sql.functions._
    import org.apache.spark.ml.feature.HashingTF
    val tf = new HashingTF().setNumFeatures(1024) // must match the entry's featurizer
    val bucket = tf.indexOf("join")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val vocab = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .select(explode(split(coalesce(col("text"), lit("")), " ")).as("t"))
        .where(org.apache.spark.sql.functions.length(col("t")) > 0).distinct()
        .collect().map(_.getString(0))
      val colliders = vocab.filter(t => t != "join" && tf.indexOf(t) == bucket)
      withClue(s"[$sf] tokens colliding with 'join' in bucket $bucket " +
        "(testdata regen broke the classifier's separability invariant): ") {
        colliders shouldBe empty
      }
    }
  }
}
