package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** A large read-only constant delivered to tasks as a Spark
  * BROADCAST instead of a plan literal.
  *
  * A `typedLit` of a multi-MB model artifact (a Bloom filter's byte
  * array, a sorted eval-set hash array) is serialized into EVERY
  * task binary of every stage that references it — at a 4M-shingle
  * eval set that is ~32 MB per task ship. Wrapping the broadcast
  * HANDLE in a leaf expression ships bytes once per executor via the
  * torrent protocol and reads them from the block manager at eval;
  * the expression is deliberately non-foldable so constant folding
  * cannot collapse it back into a literal.
  *
  * Codegen-friendly: the generated code holds one object reference
  * and calls [[valueCatalyst]], whose converted form is cached per
  * deserialized instance (once per executor, not per row). */
case class BroadcastConst(bc: Broadcast[_], override val dataType: DataType)
  extends LeafExpression {

  override def nullable: Boolean = false
  override def foldable: Boolean = false

  @transient private lazy val converter =
    CatalystTypeConverters.createToCatalystConverter(dataType)
  @transient private lazy val converted: Any = converter(bc.value)

  def valueCatalyst: Any = converted

  override def eval(input: InternalRow): Any = converted

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBroadcastConst", this,
      classOf[BroadcastConst].getName)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"final $javaType ${ev.value} = ($javaType) $ref.valueCatalyst();",
      isNull = FalseLiteral)
  }
}

object BroadcastExpressions {
  /** Broadcast `values` on `spark` and return a Column reading it —
    * a drop-in for `typedLit` on model-scale arrays. */
  def broadcastLongArray(spark: org.apache.spark.sql.SparkSession,
                         values: Array[Long]): Column =
    GraftColumnShim.column(BroadcastConst(
      spark.sparkContext.broadcast(values),
      ArrayType(LongType, containsNull = false)))

  /** Broadcast a binary blob (e.g. a serialized Bloom filter). */
  def broadcastBytes(spark: org.apache.spark.sql.SparkSession,
                     bytes: Array[Byte]): Column =
    GraftColumnShim.column(BroadcastConst(
      spark.sparkContext.broadcast(bytes), BinaryType))
}
