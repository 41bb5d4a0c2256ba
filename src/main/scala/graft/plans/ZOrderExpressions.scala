package graft.plans

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave of two 16-bit bucket ranks — the
  * data-skipping layout primitive behind Delta's OPTIMIZE ZORDER:
  * sorting by the interleaved value clusters rows that are close in
  * BOTH dimensions into the same files, so per-file min/max stats
  * prune 2-D box predicates that a single-column sort can only prune
  * on its leading column. */
object ZOrder {
  /** Interleave the low 16 bits of a (even positions) and b (odd):
    * result bit 2i = a bit i, bit 2i+1 = b bit i. Inputs are clamped
    * to [0, 65535] so callers can pass any bucket rank. */
  def interleave16(a: Long, b: Long): Long = {
    val x = spread(math.min(math.max(a, 0L), 65535L))
    val y = spread(math.max(math.min(b, 65535L), 0L))
    x | (y << 1)
  }

  /** Spread the low 16 bits of v so bit i lands at bit 2i — the
    * standard Morton bit-twiddle (each mask step doubles the gaps). */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }
}

/** Codegen'd Morton interleave of two LONG bucket ranks. */
case class ZOrderValue(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder expects (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.ZOrder.interleave16($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderValue =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpressions {
  /** Morton value of two LONG bucket-rank columns (each clamped to
    * 16 bits). Rank real-valued columns first (e.g. the
    * numericHistogram bucket formula at 2^16 buckets). */
  def zorder(a: Column, b: Column): Column =
    GraftColumnShim.column(ZOrderValue(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}
