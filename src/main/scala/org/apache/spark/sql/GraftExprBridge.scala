package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

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

  /** Parse SQL to an (unresolved) logical plan — the hook graft's pw.sql
    * dialect layer uses to rewrite the plan before analysis. */
  def parsePlan(spark: SparkSession, query: String): LogicalPlan =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser.parsePlan(query)

  /** Analyze + wrap a logical plan as a DataFrame (Spark 4 made
    * `Dataset.ofRows` `private[sql]`). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed plan of a DataFrame (for post-analysis rewrites). */
  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
