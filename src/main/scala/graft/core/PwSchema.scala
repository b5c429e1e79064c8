package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared-schema layer (reference pw.Schema — internals/schema.py:281
  * SchemaMetaclass with per-column ColumnDefinition: dtype, primary_key,
  * default_value, append_only schema.py:682-707; property propagation
  * internals/column_properties.py).
  *
  * Spark-first: the dtype part IS StructType; what Spark lacks is the
  * per-column flags and their propagation. Flags ride in StructField METADATA
  * (`pw.append_only`, `pw.primary_key`), which Catalyst preserves through
  * projections, filters, renames and joins — the same column-level
  * propagation the reference implements by hand. Aggregations/expressions
  * produce fresh attributes without metadata, which is exactly when
  * append-only stops being provable — so [[assertAppendOnly]] placed before a
  * stateful streaming op is a static safety check equivalent to the
  * reference's append-only enforcement.
  */
final case class PwColumnDef(
    name: String,
    dtype: DataType,
    primaryKey: Boolean = false,
    defaultValue: Option[Any] = None,
    appendOnly: Boolean = false,
    /** The reference's `T | None` annotation (schema.py Optional dtype) —
      * independent of default_value: a column can be optional AND carry a
      * default (test_io.py:593). Drives the connector null rules. */
    optional: Boolean = false)

final case class PwSchema(cols: Seq[PwColumnDef]) {
  import PwSchema._

  def structType: StructType = StructType(cols.map { c =>
    StructField(c.name, c.dtype,
      nullable = c.optional || (c.defaultValue.isEmpty && !c.primaryKey),
      metadata = metadataFor(c))
  })

  def primaryKey: Seq[String] = cols.filter(_.primaryKey).map(_.name)

  /** Conform `df` to this schema: project declared columns in order, cast to
    * declared dtypes, fill columns missing from the input with their declared
    * default (schema.py default_value), attach flag metadata. Fails fast on a
    * missing column without a default — the reference's eager graph-build
    * type error. */
  def attach(df: DataFrame): DataFrame = {
    val in = df.columns.toSet
    val projected = cols.map { c =>
      val base: Column =
        if (in.contains(c.name)) col(c.name).cast(c.dtype)
        else c.defaultValue match {
          case Some(v) => lit(v).cast(c.dtype)
          case None => throw new IllegalArgumentException(
            s"column '${c.name}' missing from input and has no default_value")
        }
      base.as(c.name, metadataFor(c))
    }
    df.select(projected: _*)
  }

  /** Conform + key by the declared primary key (connector `primary_key=`). */
  def keyed(df: DataFrame): PwTable = {
    require(primaryKey.nonEmpty, "schema declares no primary_key columns")
    PwTable.fromPrimaryKey(attach(df), primaryKey: _*)
  }
}

object PwSchema {
  val AppendOnlyKey = "pw.append_only"
  val PrimaryKeyKey = "pw.primary_key"

  /** pw.schema_from_csv (schema.py:927; r16 decode of
    * test_schema.py:217 test_schema_from_csv): infer a schema from a CSV
    * sample — column names from the header, per-column type = Long if EVERY
    * sampled value parses as a python int, else Double if every value
    * parses as a python float, else String; zero sampled rows → the
    * reference's Any (String here, the engine's Any carrier);
    * `numParsedRows = Some(0)` forces that. Comment lines (first
    * non-blank char == `commentCharacter`) are skipped BEFORE parsing;
    * `quote`/`doubleQuoteEscapes`/`escape` drive the tokenizer exactly like
    * python's csv module (quoted values UNQUOTE before type-sniffing — a
    * quoted "1" is an int). Driver-side sampling, like the reference's
    * local file read. */
  def fromCsv(path: String, delimiter: Char = ',', quote: Char = '"',
      commentCharacter: Option[Char] = None, escape: Option[Char] = None,
      doubleQuoteEscapes: Boolean = true,
      numParsedRows: Option[Int] = None): PwSchema = {
    val lines = scala.io.Source.fromFile(path, "UTF-8")
    val rows = try {
      val kept = lines.getLines()
        .filter(l => commentCharacter.forall(c =>
          l.dropWhile(_.isWhitespace).headOption.forall(_ != c)))
      // bounded sample: stop consuming the file once header + numParsedRows
      // rows are tokenized (r17 ADVICE — a 1-row sample of a huge file was
      // still O(file size) in driver time and memory)
      parseCsv(kept, delimiter, quote, escape, doubleQuoteEscapes,
        maxRows = numParsedRows.map(_ + 1))
    } finally lines.close()
    require(rows.nonEmpty, "can't generate Schema based on an empty CSV file")
    val header = rows.head
    val data = numParsedRows.fold(rows.tail)(n => rows.tail.take(n))

    // python int()/float() predicates (schema.py:919 _is_parsable_to)
    def isInt(s: String) = s.trim.matches("[+-]?[0-9]+")
    def isFloat(s: String) = {
      val t = s.trim.toLowerCase
      t.matches("[+-]?(inf|infinity|nan|[0-9]*\\.?[0-9]+(e[+-]?[0-9]+)?|[0-9]+\\.([0-9]*)?(e[+-]?[0-9]+)?)")
    }
    def chooseType(entries: Seq[String]): DataType =
      if (entries.isEmpty) StringType // the reference's Any
      else if (entries.forall(isInt)) LongType
      else if (entries.forall(isFloat)) DoubleType
      else StringType

    PwSchema(header.zipWithIndex.map { case (name, i) =>
      PwColumnDef(name, chooseType(data.map(r => if (i < r.length) r(i) else "")))
    })
  }

  /** python-csv-module tokenizer: quotechar with optional doubled-quote
    * escapes, optional escapechar, quoted fields may span lines. */
  private def parseCsv(lines: Iterator[String], delimiter: Char, quote: Char,
      escape: Option[Char], doubleQuoteEscapes: Boolean,
      maxRows: Option[Int] = None): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    var rowCount = 0
    val field = new StringBuilder
    var row = Vector.newBuilder[String]
    var inQuotes = false
    var anyField = false
    val bounded = lines.takeWhile(_ => maxRows.forall(rowCount < _))
    for (line <- bounded) {
      val text = if (inQuotes) "\n" + line else line
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        if (escape.contains(c) && i + 1 < text.length) {
          field += text.charAt(i + 1); i += 2
        } else if (inQuotes) {
          if (c == quote) {
            if (doubleQuoteEscapes && i + 1 < text.length && text.charAt(i + 1) == quote) {
              field += quote; i += 2
            } else { inQuotes = false; i += 1 }
          } else { field += c; i += 1 }
        } else if (c == quote && field.isEmpty) { inQuotes = true; i += 1 }
        else if (c == quote && doubleQuoteEscapes) {
          // python csv: a quote inside an unquoted field after content —
          // taken literally (covers the va"l"ue header vector)
          field += quote; i += 1
        } else if (c == delimiter) {
          row += field.result(); field.clear(); anyField = true; i += 1
        } else { field += c; i += 1 }
      }
      if (!inQuotes) {
        if (anyField || field.nonEmpty) {
          row += field.result(); field.clear()
          rows += row.result(); row = Vector.newBuilder[String]
          anyField = false
          rowCount += 1
        }
      }
    }
    if ((anyField || field.nonEmpty) && maxRows.forall(rowCount < _)) {
      row += field.result(); rows += row.result()
    }
    rows.result()
  }

  private def metadataFor(c: PwColumnDef): Metadata =
    new MetadataBuilder()
      .putBoolean(AppendOnlyKey, c.appendOnly)
      .putBoolean(PrimaryKeyKey, c.primaryKey)
      .build()

  /** Columns of `df` still provably append-only (metadata survived). */
  def appendOnlyColumns(df: DataFrame): Seq[String] =
    df.schema.fields.toSeq.collect {
      case f if f.metadata.contains(AppendOnlyKey) && f.metadata.getBoolean(AppendOnlyKey) =>
        f.name
    }

  /** Gate for stateful streaming ops that require an append-only input
    * (e.g. asof_now_join's left side, _asof_now_join.py:176): every named
    * column must still carry a provable append-only flag. */
  def assertAppendOnly(df: DataFrame, columns: String*): Unit = {
    val ok = appendOnlyColumns(df).toSet
    val bad = columns.filterNot(ok)
    require(bad.isEmpty,
      s"columns ${bad.mkString(", ")} are not provably append-only " +
        "(flag attached at ingestion via PwSchema.attach propagates through " +
        "projections/filters/joins but not through aggregates)")
  }
}
