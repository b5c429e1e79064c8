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

  /** Every catalyst expression embedded in a Column's LAZY node tree —
    * a function application keeps its argument Columns as ColumnNode
    * children, and a resolved `df("name")` argument sits in an
    * `ExpressionColumnNode` leaf with its metadata intact. Sees inside a
    * computation WITHOUT analysis, so it works even when the wrapped
    * reference cannot resolve against a given frame (a FOREIGN table's
    * column used in a computed key). */
  def embeddedExpressions(c: Column): Seq[Expression] =
    c.node.collect { case e: classic.ExpressionColumnNode => e.expression }

  /** Observed (`df.observe`) metric rows by name, robust to a metric node
    * whose logical subtree is REFERENCED MULTIPLE TIMES: Catalyst inlines
    * the subtree per use, exchange reuse executes only one copy, and
    * `QueryExecution.observedMetrics`' last-wins `toMap` can then surface an
    * unexecuted copy's zero-state accumulator. This walks every physical
    * instance (through AQE stages and subqueries) and merges duplicates with
    * `pick` (e.g. keep the row with the nonzero count — the executed one). */
  def observedMetricRows(qe: execution.QueryExecution, prefix: String,
      pick: (Row, Row) => Row): Map[String, Row] = {
    val found = scala.collection.mutable.ArrayBuffer[(String, Row)]()
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[execution.SparkPlan, java.lang.Boolean]())
    def walk(p: execution.SparkPlan): Unit = if (seen.add(p)) {
      p match {
        case c: execution.CollectMetricsExec if c.name.startsWith(prefix) =>
          found += c.name -> c.collectedMetrics
        case a: execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: execution.adaptive.QueryStageExec => walk(q.plan)
        case r: execution.ReusedSubqueryExec => walk(r.child)
        // ReusedExchangeExec is a LEAF whose `child` field references the
        // executed original exchange — the stock collector never descends,
        // which is precisely where a metric under a reused broadcast hides
        case r: execution.exchange.ReusedExchangeExec => walk(r.child)
        case _ => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(qe.executedPlan)
    found.groupMapReduce(_._1)(_._2)(pick)
  }
}
