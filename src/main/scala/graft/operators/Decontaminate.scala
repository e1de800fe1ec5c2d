package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set decontamination — the pretraining-pipeline pass that drops
  * (or flags) training documents sharing a long word n-gram with a
  * held-out benchmark, so the model is not graded on memorized eval
  * data (the GPT-3 appendix-C / PaLM / Llama dedup-against-eval rule;
  * 8-13 word grams are the published thresholds).
  *
  * Shape at 100 TB: the benchmark side is tiny (thousands of prompts),
  * so its distinct n-grams BROADCAST; the corpus side expands to
  * (doc_id, gram) pairs map-side — a generator inside the scan stage,
  * never a shuffle of the token stream — and the broadcast semi-join
  * keeps ids only. The single exchange in the whole plan is the
  * distinct on contaminated doc_ids (bounded by the corpus row count,
  * carrying 8-byte ids). The naive spelling — joining corpus grams to
  * eval grams on a shuffle — ships the whole tokenized corpus; this
  * one ships matched ids.
  */
object Decontaminate {

  /** All word n-grams of an array column `w`, as an array of joined
    * strings; empty (not descending — `sequence(1, 0)` yields [1, 0])
    * when the doc has fewer than n words. */
  private def gramArray(n: Int) = {
    val w = col("w")
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => array_join(slice(w, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-grams of `textCol`, one row per gram ("gram"). */
  def wordGrams(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(split(col(textCol), " ").as("w"))
      .select(explode(gramArray(n)).as("gram"))
      .distinct()

  /** Flag each document in `docs` (id, textCol) as contaminated iff one
    * of its word n-grams appears in `evalGrams` ("gram" column —
    * broadcast). Docs shorter than n words are never contaminated. */
  def flagContaminated(docs: DataFrame, idCol: String, textCol: String,
                       evalGrams: DataFrame, n: Int): DataFrame = {
    val grams = docs
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), explode(gramArray(n)).as("gram"))
    val hit = grams
      .join(broadcast(evalGrams), "gram", "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("contaminated", lit(1))
    docs.select(col(idCol))
      .join(hit, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("contaminated"), lit(0)).as("contaminated"))
  }
}
