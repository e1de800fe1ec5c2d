package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-pattern substring matching via the Aho–Corasick automaton
  * (Aho & Corasick, CACM 1975) — the blocklist-filtering primitive a
  * curation pipeline runs against 10k+ bad-word / URL / boilerplate
  * patterns: ONE scan-stage pass per document at O(len + matches)
  * regardless of pattern count, where a contains-chain costs
  * O(K · len) and K scan predicates.
  *
  * Semantics: counts EVERY match occurrence (all match starts,
  * overlapping included — "ana" matches "banana" twice), the standard
  * AC contract; per-pattern totals feed the distinct-pattern count and
  * the matched-pattern list (pattern-sorted, so the output is
  * engine-stable).
  *
  * Scale shape: the automaton is built ONCE driver-side from the
  * pattern table (vocabulary-bounded by contract — the
  * sketch-coordinator pattern: what crosses to the driver is patterns,
  * never documents) and ships inside the UDF closure as plain arrays
  * (broadcast with the task binary); matching is a map-side scan-stage
  * function — no shuffle, no join, payloads never leave their
  * partition. */
object AhoCorasick {

  /** Immutable flat automaton: dense per-node HashMaps for goto,
    * int fail links, per-node output pattern ids. */
  final class Automaton private[AhoCorasick] (
      private[AhoCorasick] val goto_ : Array[java.util.HashMap[Character, Integer]],
      private[AhoCorasick] val fail: Array[Int],
      private[AhoCorasick] val out: Array[Array[Int]],
      val patterns: Array[String]) extends Serializable {

    /** Per-pattern occurrence counts over `text` (all match starts). */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      if (text == null) return counts
      var s = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val c = Character.valueOf(text.charAt(i))
        var g = goto_(s).get(c)
        while (g == null && s != 0) { s = fail(s); g = goto_(s).get(c) }
        s = if (g == null) 0 else g.intValue()
        val os = out(s)
        var j = 0
        while (j < os.length) { counts(os(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** Build the goto/fail/output automaton. Deterministic in the given
    * pattern order; duplicate or empty patterns are rejected (an empty
    * pattern would match at every position). */
  def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "need at least one pattern")
    require(patterns.forall(p => p != null && p.nonEmpty), "empty pattern")
    require(patterns.distinct.length == patterns.length, "duplicate pattern")
    val goto_ = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        val c = Character.valueOf(ch)
        val nxt = goto_(s).get(c)
        if (nxt == null) {
          goto_ += new java.util.HashMap[Character, Integer]()
          outB += scala.collection.mutable.ArrayBuffer.empty[Int]
          goto_(s).put(c, Integer.valueOf(goto_.length - 1))
          s = goto_.length - 1
        } else s = nxt.intValue()
      }
      outB(s) += pi
    }
    val fail = new Array[Int](goto_.length)
    val queue = scala.collection.mutable.Queue.empty[Int]
    goto_(0).forEach((_, v) => queue.enqueue(v.intValue()))
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      goto_(r).forEach { (c, u) =>
        queue.enqueue(u.intValue())
        var st = fail(r)
        while (st != 0 && goto_(st).get(c) == null) st = fail(st)
        val f = goto_(st).get(c)
        val fl =
          if (f != null && f.intValue() != u.intValue()) f.intValue() else 0
        fail(u.intValue()) = fl
        outB(u.intValue()) ++= outB(fl)
      }
    }
    new Automaton(goto_.toArray, fail, outB.map(_.toArray).toArray,
      patterns.toArray)
  }

  /** Column function: match `textCol` against the automaton, returning
    * struct(n_hits, n_patterns, matched) — total occurrences, distinct
    * patterns hit, and the pattern-sorted comma-joined matched list. */
  def matchStats(ac: Automaton)(textCol: Column): Column = {
    val u = udf((text: String) => {
      val counts = ac.countAll(text)
      var hits = 0L
      var np = 0L
      val matched = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < counts.length) {
        if (counts(i) > 0) { np += 1; matched += ac.patterns(i) }
        hits += counts(i)
        i += 1
      }
      (hits, np, matched.sorted.mkString(","))
    })
    u(textCol)
  }

  /** Convenience: flag + annotate a corpus frame against a pattern
    * list. Output: input columns + (n_hits, n_patterns, matched,
    * blocked). */
  def blocklist(df: DataFrame, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val ac = build(patterns)
    df.withColumn("__m", matchStats(ac)(col(textCol)))
      .withColumn("n_hits", col("__m._1"))
      .withColumn("n_patterns", col("__m._2"))
      .withColumn("matched", col("__m._3"))
      .withColumn("blocked", col("n_hits") >= 1)
      .drop("__m")
  }
}
