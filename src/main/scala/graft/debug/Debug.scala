package graft.debug

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.core.PwTable

/** Debug/test I/O (reference python/pathway/debug/__init__.py):
  * `table_from_markdown` (:446) builds a table from an inline markdown grid;
  * `computeAndPrint` (:222) is show(); equality helpers mirror
  * tests/utils.py:314 assert_table_equality (order-independent). */
object Debug {

  /** Parse an inline markdown table into a PwTable. Column types are inferred
    * per column (Long → Double → Boolean → String); a leading `id` column
    * becomes the row key, otherwise ids hash all columns. Cells `None`/`` are
    * null. Mirrors pw.debug.table_from_markdown. */
  def tableFromMarkdown(spark: SparkSession, text: String): PwTable = {
    val rows = text.split("\n").map(_.trim).filter(_.nonEmpty)
      .filterNot(l => l.matches("^[|\\s:-]+$")) // separator rows
      .map(_.stripPrefix("|").stripSuffix("|").split("\\|").map(_.trim).toSeq)
    require(rows.nonEmpty, "empty markdown table")
    val header = rows.head
    val data = rows.tail.map(r => r.padTo(header.size, ""))

    def parses[T](f: String => T)(v: String): Boolean =
      try { f(v); true } catch { case _: Exception => false }
    def colType(i: Int): DataType = {
      val vals = data.map(_(i)).filter(v => v.nonEmpty && v != "None")
      if (vals.isEmpty) StringType
      else if (vals.forall(parses(_.toLong))) LongType
      else if (vals.forall(parses(_.toDouble))) DoubleType
      else if (vals.forall(v => v == "true" || v == "false")) BooleanType
      else StringType
    }
    val types = header.indices.map(colType)
    val schema = StructType(header.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true) })
    val parsed = data.map { r =>
      Row.fromSeq(r.zip(types).map {
        case (v, _) if v.isEmpty || v == "None" => null
        case (v, LongType) => v.toLong
        case (v, DoubleType) => v.toDouble
        case (v, BooleanType) => v.toBoolean
        case (v, _) => v
      })
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(parsed: _*)), schema)
    if (header.head == "id") PwTable.fromPrimaryKey(df, "id")
    else PwTable.fromAllColumns(df)
  }

  /** Order-independent multiset equality (assert_table_equality_wo_index). */
  def tablesEqual(a: DataFrame, b: DataFrame): Boolean =
    a.columns.sorted.sameElements(b.columns.sorted) && {
      val aa = a.select(a.columns.sorted.map(a(_)): _*)
      val bb = b.select(b.columns.sorted.map(b(_)): _*)
      aa.exceptAll(bb).isEmpty && bb.exceptAll(aa).isEmpty
    }

  /** compute_and_print (debug/__init__.py:222). */
  def computeAndPrint(t: PwTable, n: Int = 20): Unit = t.toDf.show(n, false)
}
