package graft

import org.apache.spark.sql.functions._

/** pl_epoch_shard invariants: the LCG sort key is a per-epoch
  * bijection (collision-free shuffle), epochs genuinely re-order,
  * shards are balanced, and the plan is a range-partitioned sort with
  * map-side key computation. */
class EpochShardSpec extends SparkSpec {
  import spark.implicits._

  private def stage(name: String, n: Int): String = {
    val dir = s"target/tmp/spec_$name"
    (0 until n).map(i => (i.toLong, 100L + i % 37))
      .toDF("doc_id", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("epoch shard: sort key is collision-free within each epoch") {
    val d = stage("eshard1", 5000)
    val out = QueriesPipeline.plEpochShard.fn(spark, d).cache()
    out.groupBy("epoch")
      .agg(count(lit(1)).as("n"), countDistinct(col("skey")).as("nk"))
      .where(col("n") =!= col("nk")).count() shouldBe 0L
    out.unpersist()
  }

  test("epoch shard: epoch 1 is a different permutation than epoch 0") {
    val d = stage("eshard2", 500)
    val out = QueriesPipeline.plEpochShard.fn(spark, d)
    val order0 = out.where(col("epoch") === 0).orderBy("skey")
      .select("doc_id").as[Long].collect().toSeq
    val order1 = out.where(col("epoch") === 1).orderBy("skey")
      .select("doc_id").as[Long].collect().toSeq
    order0.toSet shouldBe order1.toSet // same docs
    order0 should not be order1       // different order
  }

  test("epoch shard: 64 shards are balanced on 5000 docs") {
    val d = stage("eshard3", 5000)
    val counts = QueriesPipeline.plEpochShard.fn(spark, d)
      .where(col("epoch") === 0)
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    counts.size shouldBe 64
    // 5000/64 ≈ 78 expected; a full-period LCG's low bits are
    // equidistributed enough that no shard should deviate wildly
    counts.values.min should be >= 40L
    counts.values.max should be <= 130L
  }

  test("epoch shard plan: range-partitioned sort, no pre-sort exchange") {
    val d = stage("eshard4", 100)
    val plan = QueriesPipeline.plEpochShard.fn(spark, d)
      .queryExecution.executedPlan.toString
    withClue(plan) {
      plan should include("rangepartitioning")
      // exactly one exchange: the sort's range partitioner — key and
      // shard are projected inside the scan stage
      "Exchange".r.findAllIn(plan).size shouldBe 1
    }
  }

  test("62-bit variant: same one-exchange plan; sort is total WITHOUT a tiebreak") {
    val d = stage("eshard5", 3000)
    val df = QueriesPipeline.plEpochShard62.fn(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    withClue(plan) {
      plan should include("rangepartitioning")
      "Exchange".r.findAllIn(plan).size shouldBe 1
    }
    // collision-freedom is what lets the entry sort by (epoch, skey)
    // alone: every key within an epoch must be unique
    import org.apache.spark.sql.functions._
    df.groupBy("epoch")
      .agg(count(lit(1)).as("n"), countDistinct(col("skey")).as("nk"))
      .where(col("n") =!= col("nk")).count() shouldBe 0L
  }
}
