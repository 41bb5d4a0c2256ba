package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public
  * Column API. `classic.ExpressionUtils` is private[sql] in Spark 4,
  * so the (tiny, API-stable) accessors are re-exported from inside
  * the package — the conventional pattern for Spark extension
  * libraries that build Columns from custom Expressions.
  */
object GraftColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
