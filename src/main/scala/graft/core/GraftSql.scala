package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** pw.sql bridge (reference internals/sql/__init__.py:7 — sqlglot-parsed SQL
  * lowered onto Table operators, supporting SELECT/WHERE/GROUP BY/HAVING/
  * JOIN/UNION/INTERSECT/WITH and explicitly NOT ORDER BY/LIMIT).
  *
  * On Spark the entire layer is the native SQL engine: register each table as
  * a temp view, run `spark.sql` — strictly more complete than the reference's
  * subset (ORDER BY, LIMIT, window functions, subqueries all work), and the
  * resulting plan goes through Catalyst like any DataFrame. */
object GraftSql {

  /** `sql("SELECT … FROM t1 JOIN t2 …", "t1" -> df1, "t2" -> df2)` */
  def sql(spark: SparkSession, query: String, tables: (String, DataFrame)*): DataFrame = {
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    spark.sql(query)
  }

  def sql(query: String, tables: (String, PwTable)*): PwTable = {
    require(tables.nonEmpty, "need at least one table")
    val spark = tables.head._2.spark
    tables.foreach { case (name, t) => t.toDf.createOrReplaceTempView(name) }
    PwTable.fromAllColumns(spark.sql(query))
  }
}
