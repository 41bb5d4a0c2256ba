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

  /** GENERALIZED Morton interleave of k bucket ranks, `bits` bits
    * each (k·bits ≤ 63): output bit i·k + j = rank j's bit i, so the
    * sort order cycles through every dimension's bits round-robin —
    * rows close in ALL k dimensions land in the same files. Ranks
    * clamp to [0, 2^bits) like [[interleave16]] clamps to 16 bits.
    * Plain loop rather than bit-twiddles: the k=2 fast path keeps
    * [[interleave16]], and a layout rebuild's cost is the shuffle
    * and the parquet write, not this kernel. */
  def interleaveN(vs: Array[Long], bits: Int): Long = {
    val k = vs.length
    val mask = (1L << bits) - 1L
    var out = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < k) {
        val v = math.min(math.max(vs(j), 0L), mask)
        out |= ((v >>> i) & 1L) << (i * k + j)
        j += 1
      }
      i += 1
    }
    out
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

/** Codegen'd GENERALIZED Morton interleave of k LONG bucket ranks
  * (`bits` bits per dimension, k·bits ≤ 63) — the ≥3-column
  * `OPTIMIZE ZORDER` kernel. NULL if any rank is null (a null key
  * has no place on the curve; the range partitioner puts nulls
  * first, same as a plain sort would). */
case class ZOrderValueN(children: Seq[Expression], bits: Int)
  extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 2 || children.size * bits > 63)
      return TypeCheckResult.TypeCheckFailure(
        s"zorderN needs 2..${63 / math.max(bits, 1)} ranks at $bits " +
          s"bits each, got ${children.size}")
    children.find(_.dataType != LongType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"zorderN expects bigint ranks, got ${c.dataType.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = new Array[Long](children.size)
    var j = 0
    while (j < vs.length) {
      val v = children(j).eval(input)
      if (v == null) return null
      vs(j) = v.asInstanceOf[Long]
      j += 1
    }
    ZOrder.interleaveN(vs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val anyNull = ctx.freshName("zAnyNull")
    val assigns = evals.zipWithIndex.map { case (e, i) =>
      code"""
        |${e.code}
        |if (${e.isNull}) { $anyNull = true; }
        |else { $arr[$i] = ${e.value}; }"""
    }.reduce(_ + _)
    ev.copy(code =
      code"""
        |boolean $anyNull = false;
        |long[] $arr = new long[${children.size}];
        |$assigns
        |boolean ${ev.isNull} = $anyNull;
        |long ${ev.value} = $anyNull ? 0L :
        |  graft.plans.ZOrder.interleaveN($arr, $bits);""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderValueN =
    copy(children = newChildren)
}

object ZOrderExpressions {
  /** Morton value of two LONG bucket-rank columns (each clamped to
    * 16 bits). Rank real-valued columns first (e.g. the
    * numericHistogram bucket formula at 2^16 buckets). */
  def zorder(a: Column, b: Column): Column =
    GraftColumnShim.column(ZOrderValue(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Generalized Morton value of k LONG bucket-rank columns at
    * `bits` bits per dimension (k·bits ≤ 63). */
  def zorderN(ranks: Seq[Column], bits: Int): Column =
    GraftColumnShim.column(ZOrderValueN(
      ranks.map(GraftColumnShim.expression), bits))
}
