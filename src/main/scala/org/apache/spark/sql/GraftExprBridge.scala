package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's native Catalyst expressions and the public `Column`
  * API. Spark 4 made the Expression ⇄ Column converters `private[sql]`
  * (`classic.ExpressionUtils`), so this one-file shim lives in the
  * `org.apache.spark.sql` package — the standard pattern used by Spark
  * extension libraries that ship custom expressions without a
  * `SparkSessionExtensions` function-registry round-trip.
  */
object GraftExprBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
