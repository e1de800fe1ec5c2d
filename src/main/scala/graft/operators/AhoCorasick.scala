package graft.operators

import org.apache.spark.broadcast.Broadcast
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
  * Representation (r13, closes the two r12 ADVICE latents):
  *  - goto is CSR over primitive char/int arrays, binary-searched per
  *    node — no per-character boxing, no HashMap probe (the r12 shape
  *    boxed a Character and hashed per input char);
  *  - outputs are ONE pattern id per terminal node plus a fail-output
  *    link (nearest output-bearing fail ancestor), walked at match
  *    time — the r12 shape copied the full suffix-pattern closure into
  *    every node, O(n²) build memory on a nested-suffix pattern set
  *    (a, aa, …, aⁿ). Build is now linear in total pattern length.
  *
  * Scale shape: the automaton is built driver-side from the pattern
  * table (vocabulary-bounded by contract — the sketch-coordinator
  * pattern: what crosses to the driver is patterns, never documents)
  * and ships via `sc.broadcast` — one torrent-replicated copy per
  * executor instead of a closure copy per task (r12 latent, closed).
  * Past the single-automaton comfort zone (~1M patterns) the pattern
  * set is SHARDED: one automaton per shard, each broadcast, one text
  * pass per shard, counts merged per row — memory per executor is
  * bounded by the largest shard while semantics stay bit-identical
  * because pattern sets are disjoint (spec-pinned sharded≡unsharded).
  * Matching is a map-side scan-stage function — no shuffle, no join,
  * payloads never leave their partition. */
object AhoCorasick {

  /** Immutable flat automaton. `edgeChar`/`edgeTo` hold each node's
    * outgoing edges sorted by char in the CSR slice
    * [nodeOff(s), nodeOff(s+1)); `patEnd(s)` is the pattern id ending
    * exactly at s (−1 if none — distinct patterns end at distinct
    * nodes, so one slot suffices); `outLink(s)` is the nearest
    * output-bearing node on s's fail chain (−1 if none). */
  final class Automaton private[AhoCorasick] (
      private[AhoCorasick] val nodeOff: Array[Int],
      private[AhoCorasick] val edgeChar: Array[Char],
      private[AhoCorasick] val edgeTo: Array[Int],
      private[AhoCorasick] val fail: Array[Int],
      private[AhoCorasick] val patEnd: Array[Int],
      private[AhoCorasick] val outLink: Array[Int],
      val patterns: Array[String]) extends Serializable {

    /** Binary search for c in node s's sorted edge slice; −1 = no edge. */
    @inline private def step(s: Int, c: Char): Int = {
      var lo = nodeOff(s)
      var hi = nodeOff(s + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mc = edgeChar(mid)
        if (mc == c) return edgeTo(mid)
        else if (mc < c) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    /** Per-pattern occurrence counts over `text` (all match starts). */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      if (text == null) return counts
      var s = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val c = text.charAt(i)
        var g = step(s, c)
        while (g < 0 && s != 0) { s = fail(s); g = step(s, c) }
        s = if (g < 0) 0 else g
        // emit: s itself if terminal, then the fail-output chain —
        // O(matches at this position), never a precopied closure
        var v = if (patEnd(s) >= 0) s else outLink(s)
        while (v >= 0) { counts(patEnd(v)) += 1L; v = outLink(v) }
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
    // trie with per-node insertion-ordered edge buffers (sorted at freeze)
    val chB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Char])
    val toB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    val endB = scala.collection.mutable.ArrayBuffer(-1)
    def childOf(s: Int, c: Char): Int = {
      val cs = chB(s); var i = 0
      while (i < cs.length) { if (cs(i) == c) return toB(s)(i); i += 1 }
      -1
    }
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        val nxt = childOf(s, c)
        if (nxt < 0) {
          chB += scala.collection.mutable.ArrayBuffer.empty[Char]
          toB += scala.collection.mutable.ArrayBuffer.empty[Int]
          endB += -1
          chB(s) += c; toB(s) += chB.length - 1
          s = chB.length - 1
        } else s = nxt
      }
      endB(s) = pi
    }
    val nNodes = chB.length
    // freeze to CSR, edges sorted by char for binary search
    val nodeOff = new Array[Int](nNodes + 1)
    var e = 0
    var s = 0
    while (s < nNodes) { nodeOff(s) = e; e += chB(s).length; s += 1 }
    nodeOff(nNodes) = e
    val edgeChar = new Array[Char](e)
    val edgeTo = new Array[Int](e)
    s = 0
    while (s < nNodes) {
      val order = chB(s).indices.sortBy(chB(s)(_))
      var j = 0
      while (j < order.length) {
        edgeChar(nodeOff(s) + j) = chB(s)(order(j))
        edgeTo(nodeOff(s) + j) = toB(s)(order(j))
        j += 1
      }
      s += 1
    }
    def stepF(st: Int, c: Char): Int = {
      var lo = nodeOff(st); var hi = nodeOff(st + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (edgeChar(mid) == c) return edgeTo(mid)
        else if (edgeChar(mid) < c) lo = mid + 1 else hi = mid - 1
      }
      -1
    }
    val fail = new Array[Int](nNodes)
    val patEnd = endB.toArray
    val outLink = Array.fill(nNodes)(-1)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var j = nodeOff(0)
    while (j < nodeOff(1)) { queue.enqueue(edgeTo(j)); j += 1 }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      var k = nodeOff(r)
      while (k < nodeOff(r + 1)) {
        val c = edgeChar(k); val u = edgeTo(k)
        queue.enqueue(u)
        var st = fail(r)
        var f = stepF(st, c)
        while (f < 0 && st != 0) { st = fail(st); f = stepF(st, c) }
        val fl = if (f >= 0 && f != u) f else 0
        fail(u) = fl
        // nearest output-bearing fail ancestor — a pointer, not a copy
        outLink(u) = if (patEnd(fl) >= 0) fl else outLink(fl)
        k += 1
      }
    }
    new Automaton(nodeOff, edgeChar, edgeTo, fail, patEnd, outLink,
      patterns.toArray)
  }

  /** Patterns per shard. One automaton over ≤64k patterns is well
    * inside a single broadcast block; a 10M-pattern blocklist becomes
    * ~153 shards, each executor holding one shard's automaton at a
    * time during its text pass. */
  val DefaultShardSize = 65536

  /** Column function: match `textCol` against pattern shards shipped
    * as broadcasts, returning struct(n_hits, n_patterns, matched) —
    * total occurrences, distinct patterns hit, and the pattern-sorted
    * comma-joined matched list. Shards hold DISJOINT pattern sets, so
    * per-row merge is sum/sum/sorted-union — bit-identical to one
    * automaton over the full set. */
  def matchStats(shards: Seq[Broadcast[Automaton]])(textCol: Column): Column = {
    val u = udf((text: String) => {
      var hits = 0L
      var np = 0L
      val matched = scala.collection.mutable.ArrayBuffer.empty[String]
      shards.foreach { b =>
        val ac = b.value
        val counts = ac.countAll(text)
        var i = 0
        while (i < counts.length) {
          if (counts(i) > 0) { np += 1; matched += ac.patterns(i) }
          hits += counts(i)
          i += 1
        }
      }
      (hits, np, matched.sorted.mkString(","))
    })
    u(textCol)
  }

  /** Single prebuilt-automaton form (specs, custom callers). */
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
    * blocked). Builds per-shard automata driver-side and ships each
    * via broadcast. */
  def blocklist(df: DataFrame, textCol: String, patterns: Seq[String],
      shardSize: Int = DefaultShardSize): DataFrame = {
    require(shardSize >= 1, "shardSize must be >= 1")
    // Validate across the WHOLE list before sharding: per-shard build()
    // checks can't see a duplicate split across two shards, which would
    // double-count n_hits/n_patterns and break the documented
    // sharded≡unsharded invariant (r13 ADVICE).
    require(patterns.distinct.length == patterns.length, "duplicate pattern")
    val sc = df.sparkSession.sparkContext
    val shards = patterns.grouped(shardSize).toSeq.map(p => sc.broadcast(build(p)))
    df.withColumn("__m", matchStats(shards)(col(textCol)))
      .withColumn("n_hits", col("__m._1"))
      .withColumn("n_patterns", col("__m._2"))
      .withColumn("matched", col("__m._3"))
      .withColumn("blocked", col("n_hits") >= 1)
      .drop("__m")
  }
}
