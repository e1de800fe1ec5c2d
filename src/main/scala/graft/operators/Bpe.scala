package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary construction (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the tokenizer-training inner loop every modern LM pipeline runs
  * over its corpus before training.
  *
  * The feasibility trick IS the plan shape: pair statistics are
  * computed over the DISTINCT-WORD table weighted by word frequency,
  * never over the token stream — Zipf compresses a 100 TB corpus to a
  * vocabulary-sized frame (one partial-aggregating shuffle builds it,
  * exactly `tx_tokens`' shape), so each merge iteration shuffles
  * |vocab| rows and aggregates to an alphabet²-bounded pair table.
  * The per-iteration argmax is ONE collected row (the BPE contract is
  * inherently iterative with driver-side vocab state — same standard
  * as [[Components]]' per-round convergence probe); the merge itself
  * is a map-side regexp over the word table.
  *
  * Reference behavior mirrored: pair occurrences overlap-count
  * left-to-right (a word `a a a` contributes the pair (a,a) twice,
  * but a merge rewrites it greedily to `aa a`), ties break
  * lexicographically so runs are reproducible.
  */
object Bpe {

  /** (word, freq) → symbol-sequence table: each word becomes its
    * space-separated character symbols — BPE's initial state. */
  def initSymbols(wordFreq: DataFrame): DataFrame =
    wordFreq.withColumn("syms",
      array_join(split(col("word"), ""), " "))

  /** Adjacent-pair counts over the space-separated symbol column,
    * weighted by word frequency. Output: (a, b, pair_count). */
  def pairCounts(symFreq: DataFrame): DataFrame = {
    val s = split(col("syms"), " ")
    symFreq
      .where(size(s) >= 2)
      .select(col("freq"), s.as("s"),
        explode(sequence(lit(0), size(s) - 2)).as("i"))
      .select(col("freq"),
        element_at(col("s"), col("i") + 1).as("a"),
        element_at(col("s"), col("i") + 2).as("b"))
      .groupBy("a", "b")
      .agg(sum(col("freq")).as("pair_count"))
  }

  /** The most frequent pair (count desc, then lexicographic a, b) —
    * one driver-side row, the iteration's decision. Returns None when
    * no pair remains (every word fully merged). */
  def bestPair(symFreq: DataFrame): Option[(String, String)] =
    pairCounts(symFreq)
      .orderBy(col("pair_count").desc, col("a").asc, col("b").asc)
      .limit(1).collect().headOption
      .map(r => (r.getString(0), r.getString(1)))

  /** Rewrite every word's symbol sequence with (a, b) merged into
    * `ab` — greedy left-to-right on overlaps, token-boundary-safe
    * (regex literals quoted, boundaries anchored on the separator). */
  def applyMerge(symFreq: DataFrame, a: String, b: String): DataFrame = {
    val qa = java.util.regex.Pattern.quote(a)
    val qb = java.util.regex.Pattern.quote(b)
    symFreq.withColumn("syms",
      regexp_replace(col("syms"), s"(?<= |^)$qa $qb(?= |$$)", a + b))
  }

  /** Run n merge iterations; returns the learned merge list (the
    * tokenizer artifact) and the final symbol table. Driver state is
    * O(n) merge pairs — the coordinator cost BPE inherently has. */
  def learn(wordFreq: DataFrame, n: Int): (Seq[(String, String)], DataFrame) = {
    var syms = initSymbols(wordFreq)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < n && !done) bestPair(syms) match {
      case Some((a, b)) =>
        merges += ((a, b))
        // truncate iterative lineage (pin is eager; the next round's
        // bestPair collect would materialize the frame anyway)
        syms = graft.Graft.pin(applyMerge(syms, a, b), release = Some(syms))
        i += 1
      case None => done = true
    }
    (merges.toSeq, syms)
  }
}
