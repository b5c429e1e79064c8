package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) tables — the pre-partitioning story for repeated
  * big-to-big joins at 100 TB (SURVEY §7 "co-locate joins via bucketing").
  * Two tables bucketed by the join key into the SAME bucket count join with
  * NO shuffle exchange on either side: the bucket layout IS the hash
  * partitioning, persisted on disk. The reference gets the same effect from
  * its per-key sharded arrangements (dataflow/shard.rs); in Spark it's the
  * built-in bucketed-table scan, verified shuffle-free in BucketingSpec.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external table at `path`. */
  def writeBucketed(df: DataFrame, name: String, path: String,
      buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(name)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True iff the executed plan of `df` contains a shuffle exchange —
    * the thing bucketing exists to eliminate. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
