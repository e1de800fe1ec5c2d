package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md G1/J4/W2: stratified K-fold assignment and fold splits.
  *
  * Reference: StratifiedKFold(n_splits=K, shuffle=True, random_state=16)
  * (main.py:248-249). Exact sklearn membership is not reproducible (its
  * RNG); the preserved invariants are: folds are disjoint, cover all rows,
  * and per-class fold sizes differ by ≤ 1. `rand(seed)` keeps OUR
  * assignment deterministic run-to-run.
  *
  * Scale note: one window partitioned by the label — shuffles once by
  * class. Binary labels mean only 2 partitions carry data; at 100 TB
  * scale swap `rand(seed)`-ordered row_number for
  * `pmod(hash(idCol, seed), K)` (no shuffle, no skew) — same invariants
  * in expectation; kept row_number here because it preserves the exact
  * ≤1-imbalance guarantee the reference has.
  */
object Folds {

  def addStratifiedFold(df: DataFrame, labelCol: String, k: Int, seed: Long = 16): DataFrame = {
    val w = Window.partitionBy(col(labelCol)).orderBy(rand(seed))
    df.withColumn("fold", ((row_number().over(w) - 1) % k).cast("int"))
  }

  /** Deterministic variant used by oracle-checked queries: same stratified
    * round-robin but ordered by a stable key instead of rand — per-class
    * fold SIZES are identical to the random variant. */
  def addStratifiedFoldByKey(df: DataFrame, labelCol: String, keyCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(labelCol)).orderBy(col(keyCol))
    df.withColumn("fold", ((row_number().over(w) - 1) % k).cast("int"))
  }

  /** J4: fold membership split (X[train_idx] / X[test_idx], main.py:253-262). */
  def trainSplit(df: DataFrame, fold: Int): DataFrame = df.where(col("fold") =!= fold)
  def holdoutSplit(df: DataFrame, fold: Int): DataFrame = df.where(col("fold") === fold)
}
