package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Semantics + 100 TB plan shapes of the domain-mixture upsampler
  * (pl_mix_weights) and the weekly cohort retention matrix
  * (w_retention_cohort), on synthetic fixtures where the expected
  * values are computable by hand — the gate's real-data oracles pin
  * exact outputs, these pin the RULES (cap, ceil, week arithmetic)
  * and the exchange budget. */
class MixRetentionSpec extends SparkSpec {
  import spark.implicits._

  /** Entries read `$dir/<table>.parquet`; stage a synthetic table the
    * same way (a directory named table.parquet is fine for the reader). */
  private def stageDir(name: String, tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = s"target/tmp/spec_$name"
    tables.foreach { case (t, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("mix weights: rep = min(4, ceil(max_chars / lang_chars)), expansion matches") {
    // lang a: 1000 chars (the max, rep 1); b: 500 (rep 2); c: 100 (ceil 10 → cap 4)
    val docs = Seq(
      (1L, "a", 1000L), (2L, "b", 300L), (3L, "b", 200L), (4L, "c", 100L))
      .toDF("doc_id", "lang", "n_chars")
    val d = stageDir("mix", "documents" -> docs)
    val out = QueriesPipeline.plMixWeights.fn(spark, d)
      .select("doc_id", "rep", "copy_id").as[(Long, Long, Long)].collect().toSeq
    val reps = out.groupBy(_._1).view.mapValues(_.map(_._2).head).toMap
    reps shouldBe Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 4L)
    // one row per (doc, copy), copy_id densely 0..rep-1
    out.groupBy(_._1).foreach { case (id, rows) =>
      rows.map(_._3).sorted shouldBe (0L until reps(id)).toSeq
    }
    out.size shouldBe (1 + 2 + 2 + 4)
  }

  test("mix weights plan: the weight attach is a broadcast join (no fact-side shuffle)") {
    val docs = Seq((1L, "a", 10L), (2L, "b", 5L)).toDF("doc_id", "lang", "n_chars")
    val d = stageDir("mixplan", "documents" -> docs)
    val plan = QueriesPipeline.plMixWeights.fn(spark, d)
      .queryExecution.executedPlan.toString
    withClue(plan) {
      plan should include("BroadcastHashJoin")
      // every hash exchange keys the tiny per-lang aggregate (the subtree
      // prints twice: once under the max, once under the weight table);
      // the corpus side reaches the explode without shuffling
      "Exchange hashpartitioning\\(lang".r.findAllIn(plan).size shouldBe
        "Exchange hashpartitioning".r.findAllIn(plan).size
      plan should not include "hashpartitioning(doc_id"
    }
  }

  private def wk(weeks: Int, dayOfs: Int = 0): Timestamp =
    // 2024-01-01 is a Monday; offsets keep every event inside its week
    Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 12, 0)
      .plusDays(weeks * 7L + dayOfs))

  test("retention: week0 counts the cohort; later activity lands on its week offset") {
    val events = Seq(
      (1L, wk(0)), (1L, wk(0, 2)), (1L, wk(3)),   // user 1: weeks 0 and 3
      (2L, wk(0)),                                 // user 2: week 0 only
      (3L, wk(1)), (3L, wk(2)))                    // user 3: cohort week1, active week2
      .toDF("user_id", "ts")
    val d = stageDir("ret", "events" -> events)
    val out = QueriesAggWindow.wRetention.fn(spark, d)
      .select(col("cohort").cast("string"), col("week_no"), col("n_users"))
      .as[(String, Long, Long)].collect().toSeq
    out should contain theSameElementsInOrderAs Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 3L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L))
  }

  test("retention plan: one exchange per aggregation level (user, then cell)") {
    val events = Seq((1L, wk(0)), (2L, wk(1))).toDF("user_id", "ts")
    val d = stageDir("retplan", "events" -> events)
    val plan = QueriesAggWindow.wRetention.fn(spark, d)
      .queryExecution.executedPlan.toString
    withClue(plan) {
      "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 2
    }
  }
}
