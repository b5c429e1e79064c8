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
    // an UNNAMED leading column is the explicit row key (the reference's
    // `   | colA | colB` grids, where key values sit BEFORE the first `|` —
    // debug/__init__.py table_from_markdown): detected as every data row
    // carrying exactly one more cell than the header
    val header0 = rows.head
    val data0 = rows.tail
    val keyed = data0.nonEmpty && data0.forall(_.size == header0.size + 1)
    val header = if (keyed) "id" +: header0 else header0
    val data = data0.map(r => r.padTo(header.size, ""))

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

  /** StreamGenerator.table_from_markdown (debug StreamGenerator;
    * test_io.py test_stream_generator_from_markdown[_with_diffs]): the
    * grid's `_time` column orders events into batches and `_diff`
    * (+1 default, −1) adds or retracts the keyed row. Returns the raw
    * EVENT table (id, payload…, _time, _diff) — feed it to a replay
    * source, or fold it with [[streamTableFromMarkdown]]. */
  def streamEventsFromMarkdown(spark: SparkSession, text: String): DataFrame = {
    val df = tableFromMarkdown(spark, text).toDf
    require(df.columns.contains("_time"),
      "stream markdown needs a `_time` column")
    if (df.columns.contains("_diff")) df
    else df.withColumn("_diff", org.apache.spark.sql.functions.lit(1L))
  }

  /** The FINAL table a stream generated from `text` settles to: apply the
    * diffs in time order — a keyed row is present iff its net diff is
    * positive (the with_diffs vector: rows inserted then retracted vanish).
    * One groupBy over the literal events; `_time` only orders, so the net
    * per (id, payload) decides presence. */
  def streamTableFromMarkdown(spark: SparkSession, text: String): PwTable = {
    import org.apache.spark.sql.functions._
    val ev = streamEventsFromMarkdown(spark, text)
    // fail up front with the real contract (r19 advice): an unkeyed grid
    // would otherwise surface as an unrelated missing-column error deep in
    // fromPrimaryKey, and a net diff outside {0, 1} is a double-insert /
    // dangling retract that the presence filter would silently collapse
    require(ev.columns.contains("id"),
      "stream markdown needs a keyed grid (an `id` column)")
    val payload = ev.columns.filterNot(c => c == "_time" || c == "_diff")
    val folded = ev.groupBy(payload.map(col): _*)
      .agg(sum(col("_diff")).as("_net"))
    val bad = folded.filter(col("_net") < 0 || col("_net") > 1).limit(1).collect()
    require(bad.isEmpty, {
      val r = bad.head
      val net = r.getAs[Long]("_net")
      s"stream markdown row id=${r.getAs[Any]("id")} folds to net diff $net — " +
        (if (net > 1) "a duplicate-key insert" else "a retract without a matching insert")
    })
    PwTable.fromPrimaryKey(folded.filter(col("_net") > 0).drop("_net"), "id")
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
