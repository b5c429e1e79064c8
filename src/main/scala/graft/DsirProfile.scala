package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: does the DSIR one-shot pipeline recompute the raw corpus's
  * hashed-ngram counts (once under the ratio fit, once under scoring), or
  * does AQE stage reuse already dedupe the identical subtrees? Times the
  * shipped shape vs an explicitly shared (persisted) per-doc count table. */
object DsirProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TrainPrep

    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val target = d.filter(col("doc_id") % 7 === 0)
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[dsir-profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      timed("shipped dsirSelect") {
        TrainPrep.dsirSelect(d, target, col("doc_id"), col("text"),
          buckets = 8192, k = 100)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
      timed("shared-counts variant") {
        val buckets = 8192
        val rawCounts = TrainPrep.hashedNgramCounts(d, col("doc_id"), col("text"), buckets)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        rawCounts.count()
        val tc = TrainPrep.hashedNgramCounts(target, col("doc_id"), col("text"), buckets)
          .groupBy("bucket").agg(sum("cnt").as("t"))
        val rc = rawCounts.groupBy("bucket").agg(sum("cnt").as("r"))
        val tTot = broadcast(tc.agg(coalesce(sum("t"), lit(0L)).as("_tt")))
        val rTot = broadcast(rc.agg(coalesce(sum("r"), lit(0L)).as("_rt")))
        val ratios = spark.range(buckets).select(col("id").as("bucket"))
          .join(tc, Seq("bucket"), "left_outer")
          .join(rc, Seq("bucket"), "left_outer")
          .crossJoin(tTot).crossJoin(rTot)
          .select(col("bucket"),
            round((log((coalesce(col("t"), lit(0L)) + lit(1.0)) /
                       (col("_tt").cast("double") + lit(buckets.toDouble))) -
                   log((coalesce(col("r"), lit(0L)) + lit(1.0)) /
                       (col("_rt").cast("double") + lit(buckets.toDouble)))) * lit(1e6), 0)
              .cast("long").as("lr_micro"))
        val w = rawCounts.join(broadcast(ratios), "bucket")
          .groupBy("id").agg(sum(col("cnt") * col("lr_micro")).as("logw_micro"))
          .orderBy(col("logw_micro").desc, col("id").asc).limit(100)
        w.write.mode("overwrite").format("noop").save()
        rawCounts.unpersist(false)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
    sys.exit(0)
  }
}
