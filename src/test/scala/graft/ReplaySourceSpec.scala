package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Custom DataSource V2 replay source: deterministic rank-offset pacing,
  * AvailableNow drains in rowsPerBatch slices. */
class ReplaySourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("graft-replay replays a parquet table in order, rowsPerBatch per batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-replay").toString
    (1L to 10L).map(i => (i, s"row$i")).toDF("t", "payload")
      .write.mode("overwrite").parquet(dir)

    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .format("graft.sources.ReplaySource")
      .option("path", dir)
      .option("orderCol", "t")
      .option("rowsPerBatch", "4")
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ts = b.select("t").as[Long](org.apache.spark.sql.Encoders.scalaLong)
          .collect().sorted
        batchSizes.add(ts.length.toLong)
        ts.foreach(seen.add)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    assert(seen.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq ==
      (1L to 10L))
    assert(batchSizes.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq ==
      Seq(2L, 4L, 4L))
  }
}
