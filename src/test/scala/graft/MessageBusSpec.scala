package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.MessageBus
import java.nio.file.Files

/** MessageBus: transport-agnostic bus plumbing round-tripped through the
  * file-backed SpoolBus (the NATS/MQTT/Kinesis client shape without the
  * client jars). */
class MessageBusSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("publishBatch → sourceStatic round-trips messages through the spool") {
    val dir = Files.createTempDirectory("graft-bus").toString
    val out = Seq(
      ("events", "k1", """{"v":1}"""),
      ("events", "k2", """{"v":2}"""),
      ("audit", null.asInstanceOf[String], "plain text with \"quotes\" and\nnewline"))
      .toDF("topic", "key", "value")
    MessageBus.publishBatch(out, new MessageBus.SpoolBus(dir))
    val back = MessageBus.sourceStatic(spark, dir)
      .select("topic", "key", "value").as[(String, String, String)]
      .collect().toSet
    assert(back == Set(
      ("events", "k1", """{"v":1}"""),
      ("events", "k2", """{"v":2}"""),
      ("audit", null, "plain text with \"quotes\" and\nnewline")))
  }

  test("subscription callback → streaming source sees appended messages") {
    val dir = Files.createTempDirectory("graft-bus-stream").toString
    // a transport's on-message callback = appendToSpool
    MessageBus.appendToSpool(dir, Seq(("t", "a", "m1", 1L), ("t", "b", "m2", 2L)))
    val q = MessageBus.source(spark, dir)
      .writeStream.format("memory").queryName("bus_in")
      .option("checkpointLocation", Files.createTempDirectory("graft-bus-ck").toString)
      .start()
    try {
      q.processAllAvailable()
      MessageBus.appendToSpool(dir, Seq(("t", "c", "m3", 3L)))
      q.processAllAvailable()
      val got = spark.sql("SELECT key, value FROM bus_in ORDER BY key")
        .as[(String, String)].collect().toSeq
      assert(got == Seq(("a", "m1"), ("b", "m2"), ("c", "m3")))
    } finally q.stop()
  }

  test("streaming sink publishes each micro-batch through per-partition clients") {
    val dir = Files.createTempDirectory("graft-bus-sink").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val df = in.toDF().toDF("key", "value").withColumn("topic", lit("out"))
    val q = MessageBus.sink(df, new MessageBus.SpoolBus(dir))
      .option("checkpointLocation", Files.createTempDirectory("graft-bus-ck2").toString)
      .start()
    try {
      in.addData(("x", "1")); q.processAllAvailable()
      in.addData(("y", "2")); q.processAllAvailable()
      val got = MessageBus.sourceStatic(spark, dir)
        .select("key", "value").as[(String, String)].collect().toSet
      assert(got == Set(("x", "1"), ("y", "2")))
    } finally q.stop()
  }
}
