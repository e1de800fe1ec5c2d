package graft

/** The CV pipeline quality gate: on the learnable customer frame the
  * OOF log-loss must beat chance (ln 2 ≈ 0.693) by a wide margin and
  * accuracy must be near-perfect (label is linearly separable on
  * f_acctbal). Runs at sf0.001 to stay fast. */
class MlPipelineSpec extends SparkSpec {

  test("ml_cv_logloss: OOF beats chance, folds cover every row") {
    val row = QueriesMl.mlCvLogloss.fn(spark, "/root/testdata/sf0.001").head()
    val logloss = row.getAs[Double]("oof_logloss")
    val acc = row.getAs[Double]("oof_accuracy")
    val nOof = row.getAs[Long]("n_oof")
    logloss should be < 0.5 // chance = ln 2 ≈ 0.693
    acc should be > 0.9
    nOof shouldBe 150L // every customer row appears exactly once OOF
  }

  test("ml_stack: two real model families stack into [0,1] probabilities") {
    val rows = QueriesMl.mlStack.fn(spark, "/root/testdata/sf0.001").collect()
    rows.length shouldBe 150
    rows.foreach { r =>
      val p = r.getAs[Double]("stacked")
      p should (be >= 0.0 and be <= 1.0)
    }
    // stacking must produce a non-constant signal
    rows.map(_.getAs[Double]("stacked")).distinct.length should be > 10
  }

  test("ml_model_save_load: reloaded model scores identically") {
    val row = QueriesMl.mlModelSaveLoad.fn(spark, "/root/testdata/sf0.001").head()
    row.getAs[Long]("n") shouldBe 150L
    row.getAs[Long]("n_mismatch") shouldBe 0L
  }
}
