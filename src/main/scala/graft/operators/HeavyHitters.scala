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
}
