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
