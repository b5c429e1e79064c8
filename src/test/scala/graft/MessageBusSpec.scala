package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{LoopbackBus, MessageBus}
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

  test("loopback subject matching: NATS wildcard semantics") {
    import LoopbackBus.subjectMatches
    assert(subjectMatches("events.click", "events.click"))
    assert(!subjectMatches("events.click", "events.view"))
    assert(subjectMatches("events.*", "events.click"))
    assert(!subjectMatches("events.*", "events.click.eu"))
    assert(subjectMatches("events.>", "events.click.eu"))
    assert(subjectMatches("events.>", "events.click"))
    assert(!subjectMatches("events.>", "events"))
    assert(subjectMatches("*.click", "events.click"))
    assert(subjectMatches(">", "anything.at.all"))
    // NATS grammar: '>' is a wildcard only as the FINAL token — mid-pattern
    // it is a literal, never an over-matching tail
    assert(!subjectMatches("a.>.b", "a.x.y"))
    assert(!subjectMatches("a.>.b", "a.x.b"))
    assert(subjectMatches("a.>.b", "a.>.b"))
  }

  test("loopback broker end-to-end: streaming write → filtered subscribe → streaming read") {
    val bus = "e2e-bus"
    val spool = Files.createTempDirectory("graft-loopback-in").toString
    try {
      // ingress side first: subscribe to the filtered subject, stream the spool
      val (src, subId) = LoopbackBus.read(spark, bus, "events.*", spool)
      val qIn = src.writeStream.format("memory").queryName("loopback_in")
        .option("checkpointLocation", Files.createTempDirectory("graft-lb-ck1").toString)
        .start()
      // egress side: a streaming frame written through the SPI publisher,
      // per-row topics so filtering is exercised
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[(String, String, String)]
      val qOut = LoopbackBus.write(in.toDF().toDF("topic", "key", "value"), bus)
        .option("checkpointLocation", Files.createTempDirectory("graft-lb-ck2").toString)
        .start()
      try {
        in.addData(("events.click", "k1", "v1"), ("audit.login", "k2", "v2"),
          ("events.view", "k3", "v3"))
        qOut.processAllAvailable() // publish → subscriber spools matching rows
        qIn.processAllAvailable()  // spool → streaming source
        val got = spark.sql("SELECT topic, key, value FROM loopback_in ORDER BY key")
          .as[(String, String, String)].collect().toSeq
        assert(got == Seq(("events.click", "k1", "v1"), ("events.view", "k3", "v3")))
        // QoS-0: after unsubscribe, publishes are dropped (delivery count 0)
        LoopbackBus.broker(bus).unsubscribe(subId)
        assert(LoopbackBus.broker(bus).publish("events.click", "k4", "v4") == 0)
        qIn.processAllAvailable()
        assert(spark.sql("SELECT COUNT(*) FROM loopback_in").as[Long].head() == 2L)
      } finally { qIn.stop(); qOut.stop() }
    } finally LoopbackBus.drop(bus)
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
