package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.GraftPlanBridge

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
  *
  * Memory contract (the 100 TB story): O(keys·k) retained bytes is a
  * WIN only while the per-partition key set fits in memory. A
  * high-cardinality grouping key would otherwise turn the spillable
  * window-sort plan this operator replaces into an executor OOM, so
  * the exec tracks the bytes it retains and, past
  * `spark.graft.topk.fallbackBytes` (default 64 MB per partition),
  * degrades to the spill-backed path: the retained candidates plus
  * the rest of the iterator go through Spark's own
  * `UnsafeExternalRowSorter` (TaskMemoryManager-registered, spills to
  * disk — the exact sorter SortExec plans) ordered by (grouping,
  * order), followed by a streaming per-key limit. Discarded rows were
  * strictly worse than k retained rows of their key, so top-k over
  * (candidates ∪ rest) equals top-k over the full partition. The
  * fallback needs an ORDERABLE grouping type (same requirement as
  * sort-aggregate); for the rare non-orderable grouping the heap path
  * is kept as-is.
  */
/** `withTies = false` is row_number semantics (exactly k rows per
  * group); `withTies = true` is rank semantics — every row tied with
  * the k-th row's order key is kept too (r13, VERDICT r12 #7). */
case class TopKPerGroupNode(k: Int, grouping: Seq[Expression],
    order: Seq[SortOrder], child: LogicalPlan,
    withTies: Boolean = false) extends UnaryNode {
  require(k >= 1, "k must be >= 1")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Maps the logical node to its exec; injected via
  * `GraftExtensions.injectPlannerStrategy`. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(k, g, o, child, ties) =>
      TopKPerGroupExec(k, g, o, planLater(child), ties) :: Nil
    case _ => Nil
  }
}

/** Ties policy (`withTies`, rank semantics): the heap still retains the
  * k best rows, and a side buffer holds rows comparing EQUAL to the
  * current boundary (the heap's worst). The boundary only improves as
  * rows stream, so when it strictly improves the whole buffer — all
  * entries equal the OLD boundary, now beaten by k strictly-better
  * rows — is purged at once. Memory is O(k + boundary-tie-count) per
  * key: bounded in practice, adversarially unbounded (all-equal keys),
  * which is exactly what the existing byte-budget fallback to the
  * spill-backed sort covers — the sorted path applies rank semantics
  * streamingly (emit past position k only while equal to the k-th
  * row's order key). */
case class TopKPerGroupExec(k: Int, grouping: Seq[Expression],
    order: Seq[SortOrder], child: SparkPlan,
    withTies: Boolean = false) extends UnaryExecNode {

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
    val tiesLocal = withTies
    val groupingLocal = grouping
    val orderLocal = order
    val capBytes = conf.getConfString(TopKPerGroupExec.FallbackBytesKey,
      TopKPerGroupExec.FallbackBytesDefault.toString).toLong
    val fallbackOk = grouping.forall(g => RowOrdering.isOrderable(g.dataType))
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupingLocal, schema)
      val toUnsafe = UnsafeProjection.create(schema.map(a => a: Expression), schema)
      // ord orders "better first" (the caller's SortOrder); the heap
      // head must be the WORST retained row, so the queue reverses it
      val ord = new LazilyGeneratedOrdering(orderLocal, schema)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      // rank semantics: rows equal to the heap's current worst (the
      // boundary), keyed like `heaps`; purged when the boundary improves
      val tieBufs = if (tiesLocal)
        new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[UnsafeRow]]()
      else null
      var retained = 0L
      var overCap = false
      while (iter.hasNext && !overCap) {
        val row = toUnsafe(iter.next())
        var q = heaps.get(keyProj(row))
        if (q == null) {
          q = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, ord.reverse)
          // both the key and the row views alias the projection buffers:
          // copy on retention, never on rejection
          val kc = keyProj(row).copy()
          retained += kc.getSizeInBytes
          heaps.put(kc, q)
        }
        if (q.size < kLocal) {
          val rc = row.copy(); retained += rc.getSizeInBytes; q.add(rc): Unit
        } else {
          val c = ord.compare(row, q.peek())
          if (c < 0) {
            val rc = row.copy(); retained += rc.getSizeInBytes; q.add(rc): Unit
            val displaced = q.poll()
            if (tiesLocal) {
              val tb = tieBufs.get(keyProj(row))
              if (ord.compare(displaced, q.peek()) == 0) {
                // other equal-worst rows remain: boundary unchanged,
                // the displaced row is still a boundary tie
                val b = if (tb != null) tb else {
                  val nb = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
                  tieBufs.put(keyProj(row).copy(), nb); nb
                }
                b += displaced // bytes already counted
              } else {
                // boundary strictly improved: k strictly-better rows
                // now exist, so the displaced row AND every buffered
                // old-boundary tie have rank > k — purge
                retained -= displaced.getSizeInBytes
                if (tb != null && tb.nonEmpty) {
                  tb.foreach(r => retained -= r.getSizeInBytes)
                  tb.clear()
                }
              }
            } else retained -= displaced.getSizeInBytes
          } else if (tiesLocal && c == 0) {
            val tb = tieBufs.get(keyProj(row))
            val b = if (tb != null) tb else {
              val nb = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
              tieBufs.put(keyProj(row).copy(), nb); nb
            }
            val rc = row.copy(); retained += rc.getSizeInBytes; b += rc
          }
        }
        overCap = fallbackOk && retained > capBytes
      }
      if (overCap) {
        // Degrade to the spillable plan this node replaced: everything
        // retained so far is a CANDIDATE SET (rows dropped from a heap
        // lost to >= k better rows of the same key, so they can never
        // re-enter a top-k), and candidates ++ rest sorted by
        // (grouping, order) + a streaming limit-k is the window
        // spelling's exact computation, with Spark's own memory-managed
        // sorter doing the heavy lifting.
        val sorter = GraftPlanBridge.partitionSorter(schema,
          groupingLocal.map(SortOrder(_, Ascending)) ++ orderLocal)
        val drained = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
        val hit = heaps.values().iterator()
        while (hit.hasNext) {
          val q = hit.next()
          while (!q.isEmpty) drained += q.poll()
        }
        heaps.clear()
        if (tieBufs != null) {
          val tit = tieBufs.values().iterator()
          while (tit.hasNext) drained ++= tit.next()
          tieBufs.clear()
        }
        val sorted = sorter.sort(drained.iterator ++ iter.map(r => toUnsafe(r)))
        var prevKey: UnsafeRow = null
        var n = 0
        var kthRow: UnsafeRow = null // rank semantics: the k-th row's copy
        sorted.filter { r =>
          val key = keyProj(r.asInstanceOf[UnsafeRow])
          if (prevKey == null || key != prevKey) {
            prevKey = key.copy(); n = 0; kthRow = null
          }
          n += 1
          if (n <= kLocal) {
            if (tiesLocal && n == kLocal) kthRow = r.asInstanceOf[UnsafeRow].copy()
            true
          } else tiesLocal && kthRow != null &&
            ord.compare(r.asInstanceOf[UnsafeRow], kthRow) == 0
        }
      } else {
        val out = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
        val it = heaps.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val q = e.getValue
          val grp = new Array[UnsafeRow](q.size)
          var i = grp.length - 1
          while (i >= 0) { grp(i) = q.poll(); i -= 1 } // drain worst-first → store best-first
          out ++= grp
          if (tieBufs != null) {
            val tb = tieBufs.get(e.getKey)
            if (tb != null) out ++= tb
          }
        }
        out.iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupExec {
  /** Per-partition retained-bytes budget before the exec degrades to
    * the spill-backed sort path. 64 MB default: comfortably under any
    * sane executor's task share, and far above what a bounded-key
    * workload (the operator's sweet spot) ever retains. */
  val FallbackBytesKey = "spark.graft.topk.fallbackBytes"
  val FallbackBytesDefault: Long = 64L << 20
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
