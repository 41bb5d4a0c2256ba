package graft.plans

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers over Spark's built-in Bloom-filter expressions
  * (the machinery behind runtime row-level filtering, not exposed in
  * `functions._`). Both are codegen'd; the aggregate has a proper
  * partial-merge path, so building a filter over N rows is one
  * map-side pass plus a tiny binary merge.
  */
object BloomExpressions {

  /** Aggregate a LONG column (use `xxhash64(...)` for anything else)
    * into a Bloom-filter binary sized for `expectedItems` distinct
    * values (Spark derives the bit count; false-positive rate ~3%
    * at the default bits/item). */
  def bloomAgg(hashed: Column, expectedItems: Long): Column =
    GraftColumnShim.column(
      new BloomFilterAggregate(GraftColumnShim.expression(hashed),
        expectedItems).toAggregateExpression())

  /** Membership probe: true if `hashed` (LONG) may be in the filter,
    * false only if it definitely is not — no false negatives, so an
    * exact verify after this prefilter loses nothing. `bloom` must
    * be foldable or a scalar subquery (`Dataset.scalar()`). */
  def mightContain(bloom: Column, hashed: Column): Column =
    GraftColumnShim.column(BloomFilterMightContain(
      GraftColumnShim.expression(bloom),
      GraftColumnShim.expression(hashed)))

  /** Membership probe against a BROADCAST serialized filter —
    * for plans where a scalar subquery is unavailable (streaming)
    * and a literal would ship the filter bytes in every task binary.
    * The filter deserializes once per executor instance. */
  def mightContainBroadcast(bc: org.apache.spark.broadcast.Broadcast[Array[Byte]],
                            hashed: Column): Column =
    GraftColumnShim.column(BroadcastBloomMightContain(bc,
      GraftColumnShim.expression(hashed)))
}

/** Codegen'd Bloom membership test whose filter arrives via a Spark
  * broadcast instead of a plan literal or scalar subquery (both
  * unusable inside a streaming query at model scale). */
case class BroadcastBloomMightContain(
    bc: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"broadcast might_contain expects bigint, got ${other.simpleString}")
    }

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bc.value))

  def test(v: Long): Boolean = filter.mightContainLong(v)

  override protected def nullSafeEval(input: Any): Any =
    test(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomBc", this,
      classOf[BroadcastBloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.test($c)")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : BroadcastBloomMightContain = copy(child = newChild)
}
