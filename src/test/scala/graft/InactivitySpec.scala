package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Inactivity

/** Inactivity detection + utc_now (reference
  * stdlib/temporal/time_utils.py:42/72): processing-time heartbeats, a
  * planted gap produces a detection row then a resumption row, and a
  * stream with no data at all reports the since-start period. */
class InactivitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def collectRows(buf: java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Option[Long])])
      (b: org.apache.spark.sql.DataFrame, id: Long): Unit =
    b.collect().foreach { r =>
      buf.add((if (r.isNullAt(0)) null else r.getString(0),
        r.getTimestamp(1).getTime,
        if (r.isNullAt(2)) None else Some(r.getTimestamp(2).getTime)))
    }

  test("utcNow: heartbeat stream of current UTC timestamps") {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = Inactivity.utcNow(spark, refreshRateMs = 100)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => buf.add(r.getTimestamp(0).getTime))
      }
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (buf.size < 3 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(buf.size >= 3, "heartbeats must tick")
      val now = System.currentTimeMillis()
      buf.forEach(t => assert(math.abs(now - t) < 60000, "ticks are wall-clock"))
    } finally q.stop()
  }

  test("planted gap: detection row (resumed=null) then resumption row with the same key") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    val out = Inactivity.inactivityDetection(input.toDF().select(col("value")),
      allowedInactivityMs = 1200, refreshRateMs = 200,
      instance = Some(col("value")))
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Option[Long])]()
    val q = out.writeStream
      .foreachBatch(collectRows(buf) _)
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      input.addData("a"); input.addData("a")
      // wait out the allowed period: a detection row for "a" must appear
      val deadline = System.currentTimeMillis() + 30000
      while (!buf.iterator().hasNext && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val detections = buf.toArray(Array.empty[AnyRef]).map(_.asInstanceOf[(String, Long, Option[Long])])
      assert(detections.exists(e => e._1 == "a" && e._3.isEmpty),
        s"expected an open inactivity row for 'a', got ${detections.toSeq}")
      assert(!detections.exists(e => e._1 == null),
        "global group must retire once data has arrived")
      val openTs = detections.find(e => e._1 == "a" && e._3.isEmpty).get._2
      // resume activity: the same (instance, inactivity_ts) key must be
      // emitted again with resumed set
      input.addData("a")
      val deadline2 = System.currentTimeMillis() + 30000
      while (!buf.toArray(Array.empty[AnyRef]).map(_.asInstanceOf[(String, Long, Option[Long])])
          .exists(e => e._1 == "a" && e._2 == openTs && e._3.isDefined) &&
        System.currentTimeMillis() < deadline2) Thread.sleep(100)
      val all = buf.toArray(Array.empty[AnyRef]).map(_.asInstanceOf[(String, Long, Option[Long])])
      val resumed = all.find(e => e._1 == "a" && e._2 == openTs && e._3.isDefined)
      assert(resumed.isDefined, s"expected resumption row for ts=$openTs, got ${all.toSeq}")
      assert(resumed.get._3.get > openTs, "resumption is after the gap start")
    } finally q.stop()
  }

  test("no alert: activity within the allowed period never reports (reference test_no_alert)") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    // generous allowed period vs the 200 ms feed cadence so a slow trigger
    // on a loaded host cannot fake a gap
    val out = Inactivity.inactivityDetection(input.toDF().select(col("value")),
      allowedInactivityMs = 5000, refreshRateMs = 200,
      instance = Some(col("value")))
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Option[Long])]()
    val q = out.writeStream
      .foreachBatch(collectRows(buf) _)
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      val stopAt = System.currentTimeMillis() + 6000 // > allowed period
      while (System.currentTimeMillis() < stopAt) {
        input.addData("a")
        Thread.sleep(200)
      }
      assert(buf.isEmpty,
        s"continuous activity must produce no inactivity rows, got ${buf.toArray.toSeq}")
    } finally q.stop()
  }

  test("default mode (no instance): heartbeat ticks detect the gap despite sharing the group") {
    // REGRESSION: in default mode every event AND every heartbeat share the
    // single null group, so Spark's timeout callback never fires for it
    // (rows keep arriving); the kernel must detect the gap on heartbeat
    // ticks itself, the reference's utc_now-join design
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    val out = Inactivity.inactivityDetection(input.toDF().select(col("value")),
      allowedInactivityMs = 1200, refreshRateMs = 200)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Option[Long])]()
    val q = out.writeStream
      .foreachBatch(collectRows(buf) _)
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      input.addData("e1"); input.addData("e2")
      val deadline = System.currentTimeMillis() + 30000
      while (!buf.iterator().hasNext && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val detections = buf.toArray(Array.empty[AnyRef]).map(_.asInstanceOf[(String, Long, Option[Long])])
      assert(detections.exists(e => e._1 == null && e._3.isEmpty),
        s"expected a detection row in default mode, got ${detections.toSeq}")
      val openTs = detections.find(e => e._1 == null && e._3.isEmpty).get._2
      input.addData("e3") // resume
      val deadline2 = System.currentTimeMillis() + 30000
      while (!buf.toArray(Array.empty[AnyRef]).map(_.asInstanceOf[(String, Long, Option[Long])])
          .exists(e => e._1 == null && e._2 == openTs && e._3.isDefined) &&
        System.currentTimeMillis() < deadline2) Thread.sleep(100)
      val all = buf.toArray(Array.empty[AnyRef]).map(_.asInstanceOf[(String, Long, Option[Long])])
      assert(all.exists(e => e._1 == null && e._2 == openTs && e._3.isDefined),
        s"expected resumption for ts=$openTs, got ${all.toSeq}")
    } finally q.stop()
  }

  test("no data at all: the since-start period is reported on the null instance") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    val out = Inactivity.inactivityDetection(input.toDF().select(col("value")),
      allowedInactivityMs = 800, refreshRateMs = 100,
      instance = Some(col("value")))
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Option[Long])]()
    val q = out.writeStream
      .foreachBatch(collectRows(buf) _)
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (!buf.iterator().hasNext && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val rows = buf.toArray(Array.empty[AnyRef]).map(_.asInstanceOf[(String, Long, Option[Long])])
      assert(rows.nonEmpty, "a silent stream must still report")
      assert(rows.exists(e => e._1 == null && e._3.isEmpty),
        s"expected the null-instance since-start row, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("funnel guard: default mode pre-reduces events — kernel sees O(partitions), not O(events)") {
    // the r13 scale finding: every default-mode event keyed to the ONE
    // synthetic state group (a full shuffle onto one task). The stateless
    // per-partition pre-reduce must keep the kernel's input at ≤ one row
    // per partition per trigger plus heartbeats.
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    val out = Inactivity.inactivityDetection(input.toDF().select(col("value")),
      allowedInactivityMs = 60000, refreshRateMs = 1000)
    Inactivity.kernelRowsSeen.reset()
    val q = out.writeStream.format("noop")
      .trigger(Trigger.ProcessingTime(100)).start()
    try {
      input.addData((0 until 20000).map(i => s"e$i"))
      val deadline = System.currentTimeMillis() + 30000
      def processed: Long = q.recentProgress.map(_.numInputRows).sum
      while (processed < 20000 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(processed >= 20000, "input batch was not processed in time")
      val seen = Inactivity.kernelRowsSeen.sum()
      assert(seen > 0, "kernel must have run")
      assert(seen < 1000,
        s"kernel received $seen rows for 20000 events — the synthetic-group funnel is back")
    } finally q.stop()
  }

  test("inactivityDetectionReplay: streaming kernel over a finite log equals the batch analog") {
    val h = 3600L
    // two instances, gaps of 5h (closed), 1h (no), and an open 6h tail on u2
    val ev = Seq(
      ("u1", 0L), ("u1", 1L * h), ("u1", 6L * h), ("u1", 7L * h), ("u1", 20L * h),
      ("u2", 0L), ("u2", 10L * h), ("u2", 14L * h)).toDF("u", "t")
    val batch = Inactivity.inactivityPeriodsBatch(ev, col("t"), 2L * h, col("u"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    for (chunk <- Seq(0L, 1L, 3L * h, 100L * h)) { // chunking must not matter
      val replay = Inactivity.inactivityDetectionReplay(ev, col("t"), col("u"),
        allowedTicks = 2L * h, batchTicks = chunk)
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(replay == batch, s"chunk=$chunk: $replay vs $batch")
    }
  }

  test("inactivityPeriodsBatch: exact gaps incl. the open tail at the frontier") {
    val h = 3600L * 1000000000L // 1h in ns
    val ev = Seq(
      ("u1", 0L), ("u1", h / 2), ("u1", 4 * h), ("u1", 5 * h), // gap 0.5h->4h
      ("u2", 0L), ("u2", h)                                     // last seen at 1h, frontier 5h
    ).toDF("user", "t")
    val out = Inactivity.inactivityPeriodsBatch(ev, col("t"), h, col("user"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(out == Set(
      ("u1", h / 2, Some(4 * h)), // closed period
      ("u2", h, None)             // open at frontier
    ))
  }

  // ───── tests/temporal/test_time_utils.py replays (r16 decode; event-time
  //       translation: ticks are ms, the frontier is the mocked clock's end) ─────

  private def periods(rows: Seq[(String, Long)], allowed: Long,
      frontier: Long): Set[(String, Long, Option[Long])] = {
    val df = rows.toDF("i", "t")
    Inactivity.inactivityPeriodsBatch(df, col("t"), allowed, col("i"), Some(frontier))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
  }

  test("test_inactivity_detection vector: (200, resumed 900) then the open (1000, -)") {
    val events = Seq("a" -> 0L, "a" -> 50L, "a" -> 150L, "a" -> 200L,
      "a" -> 900L, "a" -> 1000L)
    assert(periods(events, 300L, 1400L) ==
      Set(("a", 200L, Some(900L)), ("a", 1000L, None)))
  }

  test("test_inactivity_detection_instance vector: per-instance periods incl. open tails") {
    val events = Seq("A" -> 0L, "A" -> 50L, "A" -> 150L, "A" -> 200L,
      "A" -> 900L, "A" -> 1000L,
      "B" -> 0L, "B" -> 200L, "B" -> 400L, "B" -> 1000L)
    assert(periods(events, 300L, 1400L) == Set(
      ("A", 200L, Some(900L)), ("A", 1000L, None),
      ("B", 400L, Some(1000L)), ("B", 1000L, None)))
  }

  test("test_no_alert boundary: a run exactly allowed_inactivity long raises nothing (strict >)") {
    assert(periods(Seq("a" -> 0L), 1000L, 1000L) == Set.empty)
    // one tick longer and the open period appears
    assert(periods(Seq("a" -> 0L), 1000L, 1001L) == Set(("a", 0L, None)))
  }

  test("add_update_timestamp_utc stamps rows with the last tick at/before the update (130 → 100)") {
    val t = Seq((1L, 0L), (2L, 0L), (3L, 0L), (1L, 130L)).toDF("value", "updated_at")
    val out = Inactivity.addUpdateTimestamp(t, col("updated_at"), 100L)
      .select("value", "updated_timestamp_utc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 0L), (2L, 0L), (3L, 0L), (1L, 100L)))
  }
}
