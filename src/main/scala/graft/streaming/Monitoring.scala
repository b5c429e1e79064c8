package graft.streaming

import java.time.Instant
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Run monitoring: the reference's console dashboard + progress reporter
  * re-expressed on Spark's own instrumentation stream.
  *
  * Reference surface (python/pathway/internals/monitoring.py):
  *  - `MonitoringLevel` NONE / IN_OUT / ALL (monitoring.py:186-199);
  *  - a per-connector table — "no. messages in the last minibatch / in the
  *    last minute / since start", plus "finished" once a source completes
  *    (monitoring.py:96-113 `get_connectors_table`);
  *  - per-operator latency (now − last processed engine time) and lag
  *    (monitoring.py:69-93 `log_line`);
  *  - a periodic refresh loop around the running computation
  *    (`monitor_stats`, monitoring.py:202-250), plus OTLP telemetry export
  *    (src/engine/telemetry.rs) and the in-engine progress reporter
  *    (src/engine/progress_reporter.rs).
  *
  * Spark-first mapping: Structured Streaming already emits one
  * `StreamingQueryProgress` per micro-batch with exactly these counters
  * (numInputRows, batchDuration, event-time watermark, state-store rows and
  * bytes), so monitoring is a [[StreamingQueryListener]] that folds the
  * progress stream into the reference's dashboard counters — no second
  * instrumentation path, no per-row overhead on the hot path (the listener
  * bus is async, off the micro-batch critical path). Batch queries are
  * covered by the Spark UI / `QueryExecutionListener`, per SURVEY.md §2's
  * mapping row.
  *
  * Telemetry export mirrors the reference's OTLP seam as a pluggable
  * [[Monitoring.MetricsSink]] SPI: the in-JVM collector used by the spec is
  * the same shape an OTLP bridge would implement (one `onProgress` per
  * micro-batch per query); the exporter jar is a registration away.
  */
object Monitoring {

  /** monitoring.py:186-199 — NONE disables, IN_OUT tracks connector message
    * counts + latency, ALL adds stateful-operator detail (state rows/bytes,
    * watermark lag — the closest Spark analogue of per-operator lag). */
  sealed trait MonitoringLevel
  case object LevelNone extends MonitoringLevel
  case object LevelInOut extends MonitoringLevel
  case object LevelAll extends MonitoringLevel

  /** One dashboard row ≙ one running query (Spark's unit of source→sink
    * connector flow; the reference's unit is one connector node). */
  final case class QueryStats(
      name: String,
      lastBatchRows: Long, // "no. messages in the last minibatch"
      lastMinuteRows: Long, // "in the last minute"
      totalRows: Long, // "since start"
      batches: Long,
      lastBatchMs: Long, // trigger latency (sum of durationMs phases)
      inputRowsPerSec: Double,
      processedRowsPerSec: Double,
      watermarkLagMs: Option[Long], // now − event-time watermark, if any
      stateRows: Long,
      stateBytes: Long,
      finished: Boolean)

  /** Telemetry seam (reference telemetry.rs exports the same counters over
    * OTLP). Called once per micro-batch per query, after counters fold. */
  trait MetricsSink {
    def onProgress(stats: QueryStats): Unit
  }

  private final class Tracked(val name: String) {
    var lastBatchRows = 0L
    var totalRows = 0L
    var batches = 0L
    var lastBatchMs = 0L
    var inputRowsPerSec = 0.0
    var processedRowsPerSec = 0.0
    var watermarkLagMs: Option[Long] = None
    var stateRows = 0L
    var stateBytes = 0L
    var finished = false
    // (wall ms, rows) per micro-batch; evicted past the 60 s window on read.
    val recent = new mutable.ArrayDeque[(Long, Long)]()

    def lastMinuteRows(now: Long): Long = {
      while (recent.nonEmpty && recent.head._1 < now - 60000L) recent.removeHead()
      recent.iterator.map(_._2).sum
    }

    def stats(now: Long): QueryStats = QueryStats(
      name, lastBatchRows, lastMinuteRows(now), totalRows, batches, lastBatchMs,
      inputRowsPerSec, processedRowsPerSec, watermarkLagMs, stateRows, stateBytes,
      finished)
  }

  /** The listener. Attach with [[Monitoring.attach]]; read with [[snapshot]]
    * or render the reference-style dashboard with [[renderTable]]. */
  final class QueryMonitor(level: MonitoringLevel) extends StreamingQueryListener {
    private val tracked = new ConcurrentHashMap[UUID, Tracked]()
    private val sinks = new java.util.concurrent.CopyOnWriteArrayList[MetricsSink]()

    def addSink(sink: MetricsSink): Unit = sinks.add(sink)

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
      val name = Option(e.name).getOrElse(e.id.toString)
      tracked.putIfAbsent(e.id, new Tracked(name))
    }

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val t = tracked.computeIfAbsent(
        p.id, _ => new Tracked(Option(p.name).getOrElse(p.id.toString)))
      val now = System.currentTimeMillis()
      t.synchronized {
        t.lastBatchRows = p.numInputRows
        t.totalRows += p.numInputRows
        t.batches += 1
        t.lastBatchMs = p.durationMs.values().asScala.map(_.longValue()).sum
        t.inputRowsPerSec = p.inputRowsPerSecond
        t.processedRowsPerSec = p.processedRowsPerSecond
        t.recent.append((now, p.numInputRows))
        if (level == LevelAll) {
          t.watermarkLagMs = Option(p.eventTime.get("watermark"))
            .filter(_.nonEmpty)
            .flatMap(w => scala.util.Try(Instant.parse(w).toEpochMilli).toOption)
            .map(wm => math.max(0L, now - wm))
          t.stateRows = p.stateOperators.map(_.numRowsTotal).sum
          t.stateBytes = p.stateOperators.map(_.memoryUsedBytes).sum
        }
      }
      val snap = t.synchronized(t.stats(now))
      sinks.iterator().asScala.foreach(_.onProgress(snap))
    }

    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      val t = tracked.get(e.id)
      if (t != null) t.synchronized { t.finished = true }
    }

    def snapshot(now: Long = System.currentTimeMillis()): Seq[QueryStats] =
      tracked.values().asScala.toSeq
        .map(t => t.synchronized(t.stats(now)))
        .sortBy(_.name)

    /** The reference's connectors table (monitoring.py:96-113), fixed-width.
      * LevelAll appends the stateful-operator columns. */
    def renderTable(now: Long = System.currentTimeMillis()): String = {
      val base = Seq("connector", "last minibatch", "last minute", "since start",
        "latency ms")
      val header =
        if (level == LevelAll) base ++ Seq("lag ms", "state rows", "state MB")
        else base
      val rows = snapshot(now).map { s =>
        val status =
          if (s.finished) "finished"
          else if (s.batches == 0) "initializing"
          else s.lastBatchRows.toString
        val cells = Seq(s.name, status, s.lastMinuteRows.toString, s.totalRows.toString,
          s.lastBatchMs.toString)
        if (level == LevelAll)
          cells ++ Seq(
            s.watermarkLagMs.map(_.toString).getOrElse("-"),
            s.stateRows.toString,
            f"${s.stateBytes / 1e6}%.1f")
        else cells
      }
      val widths = header.indices.map { i =>
        (header(i).length +: rows.map(_(i).length)).max
      }
      def fmt(cells: Seq[String]): String =
        cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString("  ")
      (fmt(header) +: rows.map(fmt)).mkString("\n")
    }
  }

  /** Register a monitor on the session's listener bus. LevelNone attaches
    * nothing (monitoring.py NONE short-circuits the dashboard the same way)
    * and returns an inert monitor. */
  def attach(spark: SparkSession, level: MonitoringLevel = LevelInOut): QueryMonitor = {
    val m = new QueryMonitor(level)
    if (level != LevelNone) spark.streams.addListener(m)
    m
  }

  def detach(spark: SparkSession, monitor: QueryMonitor): Unit =
    spark.streams.removeListener(monitor)

  /** The reference's live-refresh loop (monitoring.py:202-250): print the
    * dashboard every `intervalMs` on a daemon thread until closed. `out`
    * defaults to println so tests can capture lines. */
  def startConsoleReporter(
      monitor: QueryMonitor,
      intervalMs: Long = 1000L,
      out: String => Unit = s => println(s)): AutoCloseable = {
    @volatile var running = true
    val th = new Thread(() => {
      while (running) {
        out(monitor.renderTable())
        try Thread.sleep(intervalMs)
        catch { case _: InterruptedException => running = false }
      }
    }, "graft-monitoring-reporter")
    th.setDaemon(true)
    th.start()
    () => { running = false; th.interrupt() }
  }
}
