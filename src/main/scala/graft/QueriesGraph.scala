package graft

import org.apache.spark.sql.functions._
import Queries.Entry
import Tables._

/** Graph-analytics gate entries (beyond the dup-graph components in
  * QueriesPipeline): link-authority scoring over a bipartite
  * interaction graph. Reference scope: the reference's pipeline has no
  * graph stage at all — this family is part of the beyond-reference
  * training-data-curation surface (SURVEY §2.11), where crawl curation
  * weights sources by link authority before sampling.
  */
object QueriesGraph {

  private val Scale = 1000000000000L
  private val Iters = 5
  private val SuppOffset = 100000000L

  /** The per-iteration oracle CTE pair: contributions into each node,
    * then the damped update. Mirrors [[graft.operators.PageRank]]
    * line-for-line in integer arithmetic — `//` (DuckDB) and `div`
    * (Spark) both truncate on non-negative operands, and the
    * HUGEINT sum is cast back to BIGINT before reuse so both engines
    * carry identical 64-bit values into the next round. */
  private def sqlIter(i: Int): String = {
    val teleport = (Scale / 100L) * 15L
    s""",c$i AS (SELECT e.dst AS node,
       |  CAST(sum(r.rank // d.outdeg) AS BIGINT) AS csum
       | FROM e JOIN r${i - 1} r ON e.src = r.node JOIN d ON e.src = d.src
       | GROUP BY 1),
       |r$i AS (SELECT n.node,
       |  CAST($teleport + (85 * coalesce(c.csum, 0)) // 100 AS BIGINT) AS rank
       | FROM n LEFT JOIN c$i c USING (node))""".stripMargin
  }

  /** PageRank over the customer↔supplier interaction graph: an edge per
    * distinct (customer, supplier) trading pair (suppliers offset into
    * their own id space), bidirected so no mass dangles. 5 power
    * iterations in exact scaled-BIGINT arithmetic, then the top 20
    * authorities — suppliers with the widest customer base float up
    * with the customers who trade across many suppliers.
    *
    * Plan shape: the pair extraction is one lineitem ⨝ orders equi-join
    * feeding a distinct (both shuffles carry two longs); each iteration
    * is an equi-join + partially-aggregated groupBy per
    * [[graft.operators.PageRank]]'s contract; the final top-20 is
    * TakeOrderedAndProject (per-partition heaps, no global sort). */
  val grPageRank: Entry = Entry("gr_pagerank",
    (s, d) => {
      val pairs = tbl(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        .join(tbl(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("a"),
          (col("l_suppkey") + SuppOffset).as("b"))
        .distinct()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      operators.PageRank.pageRank(edges, Iters, Scale)
        .orderBy(col("rank").desc, col("node"))
        .limit(20)
    },
    Some(s"""WITH e0 AS (SELECT DISTINCT o_custkey AS a,
      |  l_suppkey + $SuppOffset AS b
      | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |e AS (SELECT a AS src, b AS dst FROM e0
      |      UNION ALL SELECT b, a FROM e0),
      |d AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
      |n AS (SELECT DISTINCT src AS node FROM e),
      |r0 AS (SELECT node, CAST($Scale AS BIGINT) AS rank FROM n)
      |${(1 to Iters).map(sqlIter).mkString("\n")}
      |SELECT node, rank FROM r$Iters
      |ORDER BY rank DESC, node LIMIT 20""".stripMargin))

  val all: Seq[Entry] = Seq(grPageRank)
}
