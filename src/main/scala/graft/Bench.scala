package graft
import org.apache.spark.sql.SparkSession
import java.util.concurrent.{FutureTask, TimeUnit, TimeoutException}
/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and prints
  * ONE raw JSON line (build.sbt passes forked stdout through unprefixed so the
  * driver can parse it). Queries run under a watchdog so a hang costs one entry
  * (-1 marks timeout/failure), not the whole bench. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val timeoutS = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_S", "120").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: absorb JVM/session/codegen/committer startup so it isn't
    // charged to whichever query the Map happens to iterate first
    try {
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy("n_regionkey").count()
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val task = new FutureTask[Unit](() => {
        spark.sparkContext.setJobGroup(s"bench-$name", name, interruptOnCancel = true)
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      })
      val t = new Thread(task, s"bench-$name"); t.setDaemon(true); t.start()
      val sec =
        try { task.get(timeoutS, TimeUnit.SECONDS); (System.nanoTime() - t0) / 1e9 }
        catch {
          case _: TimeoutException =>
            spark.sparkContext.cancelJobGroup(s"bench-$name"); -1.0
          case _: Throwable => -1.0
        }
      // queries are independent; drop their persisted intermediates so earlier
      // queries' caches don't distort later timings
      spark.catalog.clearCache()
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.filter(_ > 0).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    sys.exit(0)
  }
}
