package graft.plans

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Raw epoch micros of a TIMESTAMP_NTZ value, timezone-invariant.
  *
  * `unix_micros(cast(ntz as timestamp))` round-trips through the
  * SESSION timezone — two sessions in different zones compute bounds
  * hours apart, which would make stats-based file skipping unsound
  * (a pruner comparing session-shifted bounds against unshifted
  * predicate literals can skip a file that contains matches). An NTZ
  * value is internally the micros of its wall-clock reading taken as
  * UTC — exactly the comparable form the skipping layer stores and
  * the form a foldable NTZ literal evaluates to — so the conversion
  * is the identity on the unboxed long, in whole-stage codegen. */
case class NtzMicros(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ntz_micros expects timestamp_ntz, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    input.asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): NtzMicros =
    copy(child = newChild)
}

object TimeExpressions {
  /** Column face of [[NtzMicros]]. */
  def ntzMicros(c: Column): Column =
    GraftColumnShim.column(NtzMicros(GraftColumnShim.expression(c)))
}
