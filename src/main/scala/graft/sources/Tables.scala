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
    val reader =
      if (name == "events")
        // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects natively;
        // read ns as Long (see graft.operators.Temporal for µs conversion helpers).
        spark.read.option("mergeSchema", "false")
      else spark.read
    reader.parquet(s"$dir/$name.parquet")
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
