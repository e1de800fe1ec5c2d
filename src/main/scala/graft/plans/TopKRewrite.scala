package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the universal per-group top-k idiom
  *
  * {{{ df.withColumn("rn", row_number().over(W)).where($"rn" <= k).drop("rn") }}}
  *
  * into [[TopKPerGroupNode]] whenever the rank column is DISCARDED by
  * the projection above the filter — then the Window exists only to
  * bound groups, and the sort-free bounded-heap exec computes the same
  * rows without it. Users keep writing the idiomatic spelling; the
  * engine swaps the execution. (Spark's own InferWindowGroupLimit
  * recognizes the same shape but still plans two sorts plus the
  * Window evaluation; this rule removes all three — measured in
  * TopKRewriteSpec.)
  *
  * Deliberately conservative — it fires only when:
  *  - the Window computes EXACTLY ONE expression: a row_number()
  *    (exact-k), or — r13, VERDICT r12 #7 — a rank(), which maps to
  *    the node's ties-kept policy (`withTies`: every row tied with the
  *    k-th order key survives, the rank()<=k contract). dense_rank
  *    never matches: its limit counts DISTINCT keys, which no bounded
  *    heap over rows can decide online;
  *  - the filter is a bare `rn <= lit` / `rn < lit` with k >= 1;
  *  - the projection above references the rank column NOWHERE (kept
  *    ranks mean the caller wants positions — the Window must stay).
  *
  * Tie semantics are unchanged as a CLASS: under a non-total order
  * both spellings are partition-order-dependent; under a total order
  * both are exact — the determinism contract callers already carry.
  *
  * The rewrite is conf-gated (`spark.graft.topk.rewrite.enabled`,
  * default true): because this rule fires on ANY user query matching
  * the idiom, a kill switch back to the stock Window plan must exist —
  * and the exec itself degrades to the spill-backed sort past its
  * per-partition byte budget ([[TopKPerGroupExec.FallbackBytesKey]]),
  * so high-cardinality grouping keys never trade a working spilling
  * plan for an OOM.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.topk.rewrite.enabled"

  private def limitOf(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else plan.transformUp {
    case p @ Project(projectList, Filter(cond, w: Window))
        if w.windowExpressions.length == 1 &&
          w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty =>
      w.windowExpressions.head match {
        case rnAlias @ Alias(WindowExpression(fn, _), _)
            if fn.isInstanceOf[RowNumber] || fn.isInstanceOf[Rank] =>
          limitOf(cond, rnAlias.exprId) match {
            case Some(k) if k >= 1 &&
                !projectList.exists(_.references.exists(_.exprId == rnAlias.exprId)) =>
              // InferWindowGroupLimit may already have slid its hint
              // node under the Window — the heap subsumes it
              val src = w.child match {
                case wgl: WindowGroupLimit => wgl.child
                case c => c
              }
              Project(projectList,
                TopKPerGroupNode(k, w.partitionSpec, w.orderSpec, src,
                  withTies = fn.isInstanceOf[Rank]))
            case _ => p
          }
        case _ => p
      }
  }
}
