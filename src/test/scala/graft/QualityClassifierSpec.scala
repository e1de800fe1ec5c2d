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
}
