package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.PwTable

/** Batch readers for the test star schema + generic file sources
  * (reference: python/pathway/io/fs/__init__.py:32 `read`, static mode).
  * Streaming variants live in graft.streaming.Streams.
  */
object Tables {
  /** Primary keys of the driver test tables (TESTDATA.md). */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey"),
    "nation"     -> Seq("n_nationkey"),
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey"),
    "lineitem"   -> Seq("l_orderkey", "l_linenumber"),
    "events"     -> Seq("event_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def parquet(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The driver has generated `events.ts` as parquet TIMESTAMP(NANOS) in some
    * rounds (read as ns-Long under spark.sql.legacy.parquet.nanosAsLong) and
    * TIMESTAMP(MICROS) in others (read as TIMESTAMP_NTZ). Canonicalize to the
    * ns-epoch Long the engine uses internally (graft.operators.Temporal), so
    * every consumer sees one type regardless of the writer's precision.
    * Session timezone is pinned to UTC by every entry point, so the NTZ→LTZ
    * cast is wall-clock identity. */
  private def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df
      case TimestampNTZType => df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case TimestampType    => df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case other => throw new IllegalArgumentException(s"unsupported events.ts type: $other")
    }
  }

  def load(spark: SparkSession, dir: String, name: String): PwTable =
    PwTable.fromPrimaryKey(parquet(spark, dir, name), primaryKeys(name): _*)

  def lineitem(spark: SparkSession, dir: String): PwTable  = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): PwTable    = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): PwTable  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): PwTable  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): PwTable      = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): PwTable    = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): PwTable    = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): PwTable = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): PwTable = load(spark, dir, "embeddings")
  def events(spark: SparkSession, dir: String): PwTable    = load(spark, dir, "events")
}
