package graft.operators

/** Misra–Gries heavy-hitters candidate pass (Misra & Gries, "Finding
  * repeated elements", Sci. Comput. Program. 1982) — the map-side
  * pruning that makes EXACT frequent-term mining affordable at corpus
  * scale.
  *
  * Guarantee used by the two-pass plan in `tx_heavy_hitters`: a k-counter
  * MG pass over a partition of n_p items retains every term with local
  * count > n_p/(k+1). By pigeonhole, a term with GLOBAL count > N/k
  * exceeds n_p/k ≥ n_p/(k+1) in at least one partition (if c_p ≤ n_p/k
  * everywhere then Σc_p ≤ N/k), so the union of per-partition MG
  * outputs is a SUPERSET of the true heavy hitters. An exact recount of
  * candidates only then yields the exact answer — the oracle is the
  * naive GROUP BY, yet the distributed plan never shuffles the full
  * term stream: the first pass emits ≤ k terms + 1 count row per
  * partition, and the recount's exchange carries only candidate-term
  * rows (a broadcast-semi-join prunes the rest map-side).
  */
object HeavyHitters {

  /** One MG pass: (surviving candidate terms, items consumed). The
    * decrement step is O(live counters) but amortizes: each decrement
    * round cancels k+1 item-units of count mass, so total work is
    * O(n_p) counter updates. */
  private[graft] def mgPass(it: Iterator[String], k: Int): (List[String], Long) = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    var n = 0L
    while (it.hasNext) {
      val x = it.next()
      n += 1
      counters.get(x) match {
        case Some(c) => counters.update(x, c + 1)
        case None if counters.size < k => counters.update(x, 1L)
        case None =>
          val dead = List.newBuilder[String]
          counters.foreach { case (t, c) =>
            if (c == 1L) dead += t else counters.update(t, c - 1L)
          }
          dead.result().foreach(counters.remove)
      }
    }
    (counters.keys.toList, n)
  }

  /** SpaceSaving / Stream-Summary state (Metwally, Agrawal & El Abbadi,
    * "Efficient computation of frequent and top-k elements in data
    * streams", ICDT 2005) in an encoder-friendly shape: parallel Seqs
    * sorted by key so the state round-trips deterministically through
    * Spark's product encoder (a HashMap would serialize in iteration
    * order). `cnts(i)` overestimates the true count of `keys(i)` by at
    * most `errs(i)`; any item with true count > min(cnts) is guaranteed
    * present (the top-k guarantee the streaming entry leans on — and
    * with capacity ≥ distinct items the counts are EXACT, which is what
    * makes st_stream_topk hash-comparable against a SQL oracle). */
  final case class SSState(keys: Seq[String], cnts: Seq[Long],
      errs: Seq[Long], total: Long)

  implicit val ssStateEncoder: org.apache.spark.sql.Encoder[SSState] =
    org.apache.spark.sql.Encoders.product[SSState]

  val ssEmpty: SSState = SSState(Nil, Nil, Nil, 0L)

  /** Fold a batch of items into the state. Eviction picks the
    * (minCount, key)-lexicographic minimum so replays are bitwise
    * deterministic regardless of map iteration order. O(1) amortized
    * per item except the O(capacity) eviction scan — capacity is small
    * (heavy-hitter sketches are 10s-100s of counters) so the scan is
    * the cheap, allocation-free option. */
  private[graft] def ssUpdate(st: SSState, vs: Iterator[String],
      capacity: Int): SSState = {
    val m = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    st.keys.indices.foreach(i => m(st.keys(i)) = (st.cnts(i), st.errs(i)))
    var total = st.total
    vs.foreach { v =>
      total += 1
      m.get(v) match {
        case Some((c, e)) => m(v) = (c + 1, e)
        case None if m.size < capacity => m(v) = (1L, 0L)
        case None =>
          val (mk, (mc, _)) = m.minBy { case (k, (c, _)) => (c, k) }
          m.remove(mk): Unit
          m(v) = (mc + 1, mc)
      }
    }
    val ks = m.keys.toSeq.sorted
    SSState(ks, ks.map(k => m(k)._1), ks.map(k => m(k)._2), total)
  }

  /** Top-k by (count desc, key asc): (key, count, maxError) triples. */
  private[graft] def ssTopK(st: SSState, k: Int): Seq[(String, Long, Long)] =
    st.keys.indices
      .sortBy(i => (-st.cnts(i), st.keys(i)))
      .take(k)
      .map(i => (st.keys(i), st.cnts(i), st.errs(i)))
}
