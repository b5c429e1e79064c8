package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: time individual queries (args: sfDir, query names...). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val explain = sys.env.get("GRAFT_EXPLAIN").contains("1")
    args.tail.foreach { name =>
      if (explain) {
        println(s"========== $name ==========")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      } else if (sys.env.get("GRAFT_NOOP").contains("1")) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"[profile] $name%-24s ${(System.nanoTime()-t0)/1e9}%8.1f s  (noop)")
      } else {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[profile] $name%-24s ${(System.nanoTime()-t0)/1e9}%8.1f s  rows=$n")
      }
    }
    spark.stop()
  }
}
