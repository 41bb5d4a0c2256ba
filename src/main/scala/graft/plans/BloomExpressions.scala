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
}
