package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative k-core peeling (Seidman 1983, "Network structure and
  * minimum degree") — the classic graph-sparsification/community-
  * nucleus primitive: synchronously remove every node whose degree is
  * below k, recompute degrees, repeat. After enough rounds the
  * residual graph is the k-core (every node has degree ≥ k in it);
  * a FIXED round count keeps the operator deterministic and
  * oracle-replayable regardless of convergence (the
  * PageRank/LabelProp discipline — reference: graph ops in
  * /root/reference are absent; this is a §2.11 curation-adjacent
  * add).
  *
  * Scale shape: each round is one partial-aggregating degree count
  * plus two semi-joins of (long, long) edges against the surviving
  * node set — no payloads, no driver state; every round's frame is
  * lineage-pinned via [[graft.Graft.pin]] (superseded pins released)
  * so the plan stays constant-depth at any round count.
  */
object KCore {

  /** Peel `rounds` synchronous rounds at threshold `k` over a
    * BIDIRECTED distinct edge list (src, dst). Returns the per-round
    * census — (round, n_nodes, n_edges, max_deg) for round 0 (the
    * input graph) through `rounds` — the peel trajectory an audit
    * consumes; n_edges counts DIRECTED rows (2× undirected edges).
    * Empty residual graphs census as (r, 0, 0, 0). */
  def peelCensus(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    def census(r: Int, deg: DataFrame): DataFrame =
      deg.agg(count(lit(1)).as("n_nodes"),
          coalesce(sum(col("deg")), lit(0L)).as("n_edges"),
          coalesce(max(col("deg")), lit(0L)).as("max_deg"))
        .select(lit(r.toLong).as("round"),
          col("n_nodes"), col("n_edges"), col("max_deg"))
    var alive = edges
    var prevPin: Option[DataFrame] = None
    var rows = Vector.empty[DataFrame]
    var r = 0
    while (r <= rounds) {
      val deg = alive.groupBy("src").agg(count(lit(1)).as("deg"))
      rows :+= census(r, deg)
      if (r < rounds) {
        val keep = deg.where(col("deg") >= k).select(col("src").as("n"))
        val next = alive.alias("t")
          .join(keep.alias("x"), col("t.src") === col("x.n"), "leftsemi")
          .join(keep.alias("y"), col("t.dst") === col("y.n"), "leftsemi")
        val pinned = graft.Graft.pin(next, prevPin)
        prevPin = Some(pinned)
        alive = pinned
      }
      r += 1
    }
    // contractual row order (r12, ADVICE r11): the verify compare is
    // order-sensitive and the oracle ends ORDER BY round — don't rely
    // on union preserving operand order (rounds+1 rows, trivial sort)
    rows.reduce(_.unionAll(_)).orderBy("round")
  }
}
