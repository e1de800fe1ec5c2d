package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step a production dedup pipeline runs AFTER near-dup pair
  * generation (LSH emits pairwise matches; near-duplication is not
  * transitive, so keeping one doc per *component* of the match graph
  * is the actual dedup semantics, e.g. A~B and B~C must collapse to
  * one cluster even when A~C fails the threshold).
  *
  * Algorithm: alternating large-star / small-star rounds (Kiveris,
  * Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components
  * in MapReduce and Beyond", SoCC 2014). Unlike naive min-label
  * propagation — O(graph diameter) shuffle rounds, fatal on the long
  * chains real dup graphs contain — the alternating star rounds
  * converge in O(log n) rounds regardless of diameter.
  *
  * 100 TB design notes:
  *  - every shuffle carries (long, long) pairs only — never payloads;
  *  - the per-node neighborhood minimum is a `groupBy().agg(min)` —
  *    partially aggregatable, so map-side combine absorbs the skew a
  *    high-degree star center would otherwise create (no
  *    collect_list of neighbor arrays anywhere);
  *  - each round's result is localCheckpoint'ed: iterative plans nest
  *    their predecessor, so without lineage truncation the logical
  *    plan grows exponentially with rounds (caching alone does NOT
  *    truncate it). Rounds are few (O(log n)) and edge rows tiny, so
  *    the handful of pinned checkpoint blocks per run is bounded; a
  *    cluster deployment would use reliable checkpoints instead. The
  *    convergence probe is a single count+checksum aggregate.
  */
object Components {

  /** One large-star round over canonically oriented edges (u > v).
    * Every node attaches its strictly-LARGER neighbors to the minimum
    * of its closed neighborhood. */
  private[graft] def largeStar(e: DataFrame): DataFrame = {
    val bidir = e.select(col("u"), col("v"))
      .unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val mins = bidir.groupBy("u").agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    bidir.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v")) // v > u ≥ m ⇒ oriented
      .where(col("u") =!= col("v"))
    // no distinct here: smallStar's groupBy-min is duplicate-insensitive
    // and its own final distinct dedups the round's output — dropping
    // the intermediate exchange saves one full shuffle per round
  }

  /** One small-star round: every node attaches its smaller-or-equal
    * neighbors (and itself) to its minimum neighbor. Input and output
    * are canonically oriented (u > v). */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min(col("v")).as("m"))
    e.join(mins, "u")
      .select(col("v").as("n"), col("m"))
      .unionAll(mins.select(col("u").as("n"), col("m")))
      .where(col("n") =!= col("m"))
      .select(greatest(col("n"), col("m")).as("u"),
        least(col("n"), col("m")).as("v"))
      .distinct()
  }

  /** Connected components of the graph given by `edges` (columns
    * (u: long, v: long); orientation, duplicates and self-loops are
    * normalized away). Returns (id, component) for every vertex that
    * appears in an edge, where component = the minimum vertex id of
    * its component. Isolated vertices don't appear (callers union
    * them back with component = id). */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(sum(xxhash64(col("u"), col("v"))), lit(0L)))
        .as[(Long, Long)].collect()(0)
      r
    }

    var cur = graft.Graft.pin(edges
      .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct())
    var curChk = checksum(cur)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = graft.Graft.pin(smallStar(largeStar(cur)), release = Some(cur))
      val nextChk = checksum(next)
      converged = nextChk == curChk
      cur = next
      curChk = nextChk
      rounds += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    // Fixed point of the star rounds: every edge is (member, root) with
    // root = min id of the component. Roots name their own component.
    cur.select(col("u").as("id"), col("v").as("component"))
      .unionAll(cur.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }
}
