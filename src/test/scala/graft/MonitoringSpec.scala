package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Millis, Seconds, Span}

import graft.streaming.Monitoring
import graft.streaming.Monitoring._

/** The monitoring dashboard (reference internals/monitoring.py): connector
  * message counters, finished state, console table, and the MetricsSink
  * telemetry seam — driven by real micro-batches. The listener bus is async,
  * so every read is wrapped in `eventually`. */
class MonitoringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val patience = timeout(Span(20, Seconds))
  private val poll = interval(Span(100, Millis))

  test("connector counters: last minibatch / last minute / since start, then finished") {
    implicit val sc = spark.sqlContext
    val monitor = Monitoring.attach(spark, LevelInOut)
    val sunk = new ConcurrentLinkedQueue[QueryStats]()
    monitor.addSink(s => sunk.add(s))
    try {
      val input = MemoryStream[Int]
      val q = input.toDF().writeStream.format("memory")
        .queryName("mon_counts").start()
      try {
        input.addData(1 to 40: _*)
        q.processAllAvailable()
        eventually(patience, poll) {
          val s = monitor.snapshot().find(_.name == "mon_counts").get
          assert(s.totalRows == 40 && s.lastBatchRows == 40)
          assert(s.lastMinuteRows == 40)
          assert(s.batches >= 1 && s.lastBatchMs >= 0)
          assert(!s.finished)
        }
        input.addData(1 to 25: _*)
        q.processAllAvailable()
        eventually(patience, poll) {
          val s = monitor.snapshot().find(_.name == "mon_counts").get
          assert(s.totalRows == 65 && s.lastBatchRows == 25)
          assert(s.lastMinuteRows == 65)
        }
      } finally q.stop()
      eventually(patience, poll) {
        assert(monitor.snapshot().find(_.name == "mon_counts").get.finished)
      }
      // telemetry seam saw the same fold (≥ one callback per data batch)
      val seen = sunk.asScala.filter(_.name == "mon_counts")
      assert(seen.exists(_.totalRows == 40))
      assert(seen.exists(_.totalRows == 65))
    } finally Monitoring.detach(spark, monitor)
  }

  test("LevelAll records state rows and watermark lag for a stateful query") {
    implicit val sc = spark.sqlContext
    val monitor = Monitoring.attach(spark, LevelAll)
    try {
      val input = MemoryStream[(java.sql.Timestamp, String)]
      val counts = input.toDF().toDF("ts", "k")
        .withWatermark("ts", "1 second")
        .groupBy($"k").count()
      val q = counts.writeStream.format("memory").queryName("mon_state")
        .outputMode("update").start()
      try {
        val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
        input.addData((t0, "a"), (t0, "b"), (t0, "a"))
        q.processAllAvailable()
        eventually(patience, poll) {
          val s = monitor.snapshot().find(_.name == "mon_state").get
          assert(s.totalRows == 3)
          assert(s.stateRows == 2) // two live keys in the agg state store
          assert(s.watermarkLagMs.isDefined)
        }
      } finally q.stop()
    } finally Monitoring.detach(spark, monitor)
  }

  test("renderTable shows the reference's dashboard columns and row states") {
    implicit val sc = spark.sqlContext
    val monitor = Monitoring.attach(spark, LevelInOut)
    try {
      val input = MemoryStream[Int]
      val q = input.toDF().writeStream.format("memory")
        .queryName("mon_render").start()
      try {
        input.addData(1, 2, 3)
        q.processAllAvailable()
        eventually(patience, poll) {
          val table = monitor.renderTable()
          assert(table.contains("connector") && table.contains("since start"))
          assert(table.linesIterator.exists(l =>
            l.startsWith("mon_render") && l.contains("3")))
        }
      } finally q.stop()
      eventually(patience, poll) {
        assert(monitor.renderTable().contains("finished"))
      }
    } finally Monitoring.detach(spark, monitor)
  }

  test("console reporter emits dashboard frames until closed; LevelNone attaches nothing") {
    val monitor = Monitoring.attach(spark, LevelInOut)
    val frames = new ConcurrentLinkedQueue[String]()
    val reporter = Monitoring.startConsoleReporter(monitor, intervalMs = 50L, out = frames.add(_))
    try {
      eventually(patience, poll) { assert(frames.size() >= 2) }
      assert(frames.peek().contains("connector"))
    } finally {
      reporter.close()
      Monitoring.detach(spark, monitor)
    }
    val before = spark.streams.listListeners().length
    val none = Monitoring.attach(spark, LevelNone)
    assert(spark.streams.listListeners().length == before) // not registered
    assert(none.snapshot().isEmpty)
  }
}
