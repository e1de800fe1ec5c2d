package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Native Catalyst expression computing a 2-D Z-order (Morton) key:
  * the low 16 bits of each long input are bit-interleaved into a
  * 32-bit key (x in the even positions, y in the odd). Sorting or
  * range-partitioning a table by this key clusters rows that are close
  * in BOTH dimensions into the same file/partition — the data-layout
  * primitive behind multi-column clustering in lakehouse formats
  * (Morton, "A computer oriented geodetic data base", 1966; same role
  * as Z-ordering in public lakehouse engines). A write path ordered by
  * `zorder2(a, b)` gives min/max file statistics that prune on either
  * column — the layout story the brief's 100 TB scan efficiency needs.
  *
  * Codegen tier (SURVEY §2.10 custom-operator ladder, (b)): the
  * interleave is a tight 16-iteration integer loop inside whole-stage
  * codegen, vs an interpreted 16-element higher-order fold. Inputs
  * outside [0, 65536) are masked to their low 16 bits — callers bucket
  * or quantize first (the gate entry quantizes with pmod).
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  // Any integral type is accepted and read as long (SQL users write
  // zorder2(3, 5) with INT literals; ImplicitCastInputTypes is
  // unavailable outside org.apache.spark — AbstractDataType is
  // private[sql] — so widen the check instead; the codegen's
  // `& 0xffffL` promotes int operands for free).
  private def integral(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (l, r) if integral(l) && integral(r) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder2 expects integral inputs, got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Number].longValue & 0xffffL
    val y = b.asInstanceOf[Number].longValue & 0xffffL
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |final long $x = $a & 0xffffL;
         |final long $y = $b & 0xffffL;
         |long $z = 0L;
         |for (int $i = 0; $i < 16; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i);
         |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}
