package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-group top-k as a first-class operator — the custom-surface
  * ladder's rung (c): a whole `LogicalPlan` node + `SparkStrategy` +
  * `SparkPlan`, registered through the same `GraftExtensions` the
  * native expressions use.
  *
  * Why a custom operator at all: the built-in spelling
  * (`row_number().over(Window.partitionBy(g).orderBy(o)) <= k`) must
  * SORT every partition fully — at 100 TB that is a spill-backed sort
  * of the whole fact table just to discard all but k rows per key.
  * This node keeps the same single hash exchange (Spark inserts it
  * from `requiredChildDistribution`, so AQE still plans/coalesces it)
  * but replaces the sort with per-key BOUNDED HEAPS: O(n log k) time,
  * O(keys·k) memory, nothing spills, and the limit is applied DURING
  * the scan of the shuffled iterator rather than after a sort
  * materializes. Same reasoning as Spark's own global
  * `TakeOrderedAndProject` — generalized per key.
  *
  * Determinism contract: callers must pass a TOTAL order (add a
  * tiebreak column, as [[graft.QueriesSql]]'s gate entry does) —
  * under ties the heap keeps first-arrival, which is partition-order
  * dependent, exactly like the window spelling's nondeterminism under
  * non-total orders.
  */
case class TopKPerGroupNode(k: Int, grouping: Seq[Expression],
    order: Seq[SortOrder], child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "k must be >= 1")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Maps the logical node to its exec; injected via
  * `GraftExtensions.injectPlannerStrategy`. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(k, g, o, child) =>
      TopKPerGroupExec(k, g, o, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(k: Int, grouping: Seq[Expression],
    order: Seq[SortOrder], child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** One hash exchange on the grouping key — the planner inserts it,
    * AQE coalesces it; NO required ordering, which is the point. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(grouping) :: Nil

  /** The exchange's clustering survives this operator, so a downstream
    * groupBy on the same key plans no further shuffle. */
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val kLocal = k
    val groupingLocal = grouping
    val orderLocal = order
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupingLocal, schema)
      val toUnsafe = UnsafeProjection.create(schema.map(a => a: Expression), schema)
      // ord orders "better first" (the caller's SortOrder); the heap
      // head must be the WORST retained row, so the queue reverses it
      val ord = new LazilyGeneratedOrdering(orderLocal, schema)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = toUnsafe(iter.next())
        var q = heaps.get(keyProj(row))
        if (q == null) {
          q = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, ord.reverse)
          // both the key and the row views alias the projection buffers:
          // copy on retention, never on rejection
          heaps.put(keyProj(row).copy(), q)
        }
        if (q.size < kLocal) q.add(row.copy())
        else if (ord.compare(row, q.peek()) < 0) {
          q.poll(); q.add(row.copy()): Unit
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
      val it = heaps.values().iterator()
      while (it.hasNext) {
        val q = it.next()
        val grp = new Array[UnsafeRow](q.size)
        var i = grp.length - 1
        while (i >= 0) { grp(i) = q.poll(); i -= 1 } // drain worst-first → store best-first
        out ++= grp
      }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Column-API entry point: per-`keyCols` top-`k` rows of `df` under
  * (`ordCol` asc/desc, `tieCol` asc) — the tiebreak makes the order
  * total, so results are deterministic and oracle-checkable. */
object TopKPerGroup {
  def apply(df: DataFrame, keyCols: Seq[String], ordCol: String,
      descending: Boolean, tieCol: String, k: Int): DataFrame = {
    val lp = df.queryExecution.analyzed
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${lp.output.map(_.name).mkString(", ")}"))
    val ord = Seq(
      SortOrder(attr(ordCol), if (descending) Descending else Ascending),
      SortOrder(attr(tieCol), Ascending))
    org.apache.spark.sql.GraftPlanBridge.ofRows(df.sparkSession,
      TopKPerGroupNode(k, keyCols.map(attr), ord, lp))
  }
}
