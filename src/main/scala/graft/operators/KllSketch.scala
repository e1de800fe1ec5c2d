package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable streaming quantile sketch — the KLL compactor ladder
  * (Karnin/Lang/Liberty 2016, the sketch behind every production
  * percentile rollup), as a typed Spark [[Aggregator]]. This fills the
  * one hole in Spark's mergeable-aggregate surface the HLL entry
  * (g_hll_mergeable) can't: `approx_percentile` exposes NO partial you
  * can store per group and union later, so a percentile roll-up
  * (day → month, shard → corpus) must re-scan facts. This Aggregator's
  * state IS the mergeable partial: O(K·log(n/K)) doubles, built in one
  * pass, merged associatively — exactly the partial+final contract
  * Spark's own aggregation planner runs it under
  * (ObjectHashAggregate: reduce per partition, merge across).
  *
  * Shape: level 0 is a fixed K-slot insert buffer (weight-1 items);
  * level j ≥ 1 holds ≤ K items each representing 2^j originals. A full
  * buffer sorts and keeps every other element (alternating offset from
  * a parity counter — DETERMINISTIC, where the paper flips a coin;
  * the alternation keeps the ±1-item bias centered), promoting K/2
  * items one level up. Rank error after any merge sequence stays
  * O(log(n/K)/K) — single-digit permille at K=256 for n ≤ 10^9 —
  * which the gate entry checks against exact percentiles.
  *
  * Determinism caveat (why the gate is a quality bound, not a hash):
  * the sketch CONTENT depends on arrival order, and Spark's partition
  * merge order is scheduler-dependent — same data, same answer
  * up to the error bound, not bit-identical state. That is inherent to
  * every mergeable quantile sketch, not an implementation choice.
  */
object KllSketch {

  val K = 256

  /** levels(0) is the raw insert buffer (first `n0` slots live, weight
    * 1); levels(j ≥ 1) are compacted buffers of weight 2^j. `parity`
    * drives the alternating compaction offset. */
  case class KllState(var l0: Array[Double], var n0: Int,
      var levels: Array[Array[Double]], var count: Long, var parity: Long)

  def empty: KllState =
    KllState(new Array[Double](K), 0, Array.empty, 0L, 0L)

  /** Sort + keep-every-other: m items in, ~m/2 out, one level up. */
  private def halve(buf: Array[Double], parity: Long): Array[Double] = {
    val sorted = buf.sorted
    val off = (parity & 1L).toInt
    Array.tabulate((sorted.length - off + 1) / 2)(i => sorted(off + 2 * i))
  }

  /** Append `items` (weight 2^(j+1)) into compacted level index `j`,
    * cascading further compactions while a level overflows. */
  @annotation.tailrec
  private def push(st: KllState, j: Int, items: Array[Double]): Unit = {
    if (st.levels.length <= j)
      st.levels = st.levels ++ Array.fill(j + 1 - st.levels.length)(
        Array.empty[Double])
    val merged = st.levels(j) ++ items
    if (merged.length < K) st.levels(j) = merged
    else {
      st.levels(j) = Array.empty
      st.parity += 1
      push(st, j + 1, halve(merged, st.parity))
    }
  }

  private def compactL0(st: KllState): Unit = {
    st.parity += 1
    val promoted = halve(java.util.Arrays.copyOf(st.l0, st.n0), st.parity)
    st.n0 = 0
    push(st, 0, promoted)
  }

  /** O(1) amortized; mutates and returns `st` (Aggregator buffer
    * contract allows it). */
  def insert(st: KllState, v: Double): KllState = {
    st.l0(st.n0) = v
    st.n0 += 1
    st.count += 1
    if (st.n0 == K) compactL0(st)
    st
  }

  /** Associative merge: absorb `b`'s raw buffer element-wise (≤ K
    * items), then level-wise concatenation with cascade compaction. */
  def merge(a: KllState, b: KllState): KllState = {
    var i = 0
    while (i < b.n0) { insert(a, b.l0(i)); a.count -= 1; i += 1 }
    a.count += b.count
    a.parity += b.parity
    var j = 0
    while (j < b.levels.length) {
      if (b.levels(j).nonEmpty) push(a, j, b.levels(j))
      j += 1
    }
    a
  }

  /** Estimated quantiles: weighted items sorted by value; answer for q
    * is the smallest value whose cumulative weight reaches q·W (the
    * "lower quantile" convention — exact when the state is all
    * weight-1, i.e. n ≤ K). */
  def quantiles(st: KllState, qs: Seq[Double]): Seq[Double] = {
    val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < st.n0) { items += ((st.l0(i), 1L)); i += 1 }
    var j = 0
    while (j < st.levels.length) {
      st.levels(j).foreach(v => items += ((v, 1L << (j + 1))))
      j += 1
    }
    if (items.isEmpty) return qs.map(_ => Double.NaN)
    val sorted = items.sortBy(_._1).toArray
    val w = sorted.map(_._2).sum
    qs.map { q =>
      val target = q * w
      var cum = 0L
      var idx = 0
      while (idx < sorted.length - 1 && cum + sorted(idx)._2 < target) {
        cum += sorted(idx)._2
        idx += 1
      }
      sorted(idx)._1
    }
  }

  implicit val stateEncoder: Encoder[KllState] = Encoders.product[KllState]

  /** Build a sketch from rows of type I. */
  class SketchAgg[I](f: I => Double) extends Aggregator[I, KllState, KllState] {
    override def zero: KllState = empty
    override def reduce(b: KllState, a: I): KllState = insert(b, f(a))
    override def merge(b1: KllState, b2: KllState): KllState =
      KllSketch.merge(b1, b2)
    override def finish(r: KllState): KllState = r
    override def bufferEncoder: Encoder[KllState] = stateEncoder
    override def outputEncoder: Encoder[KllState] = stateEncoder
  }

  /** Roll up already-built sketches (the day → month merge). */
  class MergeAgg[I](f: I => KllState) extends Aggregator[I, KllState, KllState] {
    override def zero: KllState = empty
    override def reduce(b: KllState, a: I): KllState = merge(b, f(a))
    override def merge(b1: KllState, b2: KllState): KllState =
      KllSketch.merge(b1, b2)
    override def finish(r: KllState): KllState = r
    override def bufferEncoder: Encoder[KllState] = stateEncoder
    override def outputEncoder: Encoder[KllState] = stateEncoder
  }
}
