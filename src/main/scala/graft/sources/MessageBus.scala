package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Transport-agnostic message-bus connector plumbing (reference
  * `python/pathway/io/{nats,mqtt,kinesis,pubsub}` — each is a thin
  * reader/writer over a topic + message format; the Spark-side shape is
  * identical across them).
  *
  * The transport is an SPI: a NATS/MQTT/RabbitMQ/Kinesis adapter implements
  * [[BusPublisher]] (egress) and calls [[appendToSpool]] from its subscription
  * callback (ingress). Everything Spark-side — per-partition publisher
  * lifecycle, batched egress via foreachBatch, streaming ingress as an
  * append-only file spool watched by readStream — is transport-independent and
  * integration-tested here with the file-backed [[SpoolBus]] (those client
  * jars aren't in this container; the contract is what's testable).
  *
  * Ingress design: push-style buses deliver via callbacks, but a Structured
  * Streaming source must be pull-replayable — so the subscriber daemon spools
  * messages to files (atomic rename per batch) and the stream reads the spool
  * (exactly the Http.restConnector design, and the same recovery story:
  * offsets = files, replay = re-read).
  */
object MessageBus {

  /** Wire schema: one row per message. `value` carries the raw payload;
    * decode with `parseJsonValue` (or from_json/custom) downstream. */
  val messageSchema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = false),
    StructField("publish_ts", LongType, nullable = false)))

  /** Egress SPI — one instance per executor partition. */
  trait BusPublisher extends Serializable {
    def open(partitionId: Long, epochId: Long): Unit
    def publish(topic: String, key: String, value: String): Unit
    def close(): Unit
  }

  /** Append a batch of messages to the spool atomically (tmp + rename), as
    * jsonlines rows of [[messageSchema]]. Called by transport subscription
    * callbacks (the ingress daemon), never by Spark executors. */
  def appendToSpool(spoolDir: String, messages: Seq[(String, String, String, Long)]): Unit = {
    Files.createDirectories(Paths.get(spoolDir))
    def esc(s: String): String =
      if (s == null) "null"
      else "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\r' => "\\r"; case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val lines = messages.map { case (topic, key, value, ts) =>
      s"""{"topic":${esc(topic)},"key":${esc(key)},"value":${esc(value)},"publish_ts":$ts}"""
    }.mkString("", "\n", "\n")
    val tmp = Files.createTempFile(Paths.get(spoolDir), ".in-", ".tmp")
    Files.write(tmp, lines.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(spoolDir, tmp.getFileName.toString.stripPrefix(".") + ".jsonl"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Streaming ingress over the subscriber spool. */
  def source(spark: SparkSession, spoolDir: String): DataFrame =
    spark.readStream.schema(messageSchema)
      .option("maxFilesPerTrigger", "64")
      .json(spoolDir)

  /** Static (batch) read of everything spooled so far. */
  def sourceStatic(spark: SparkSession, spoolDir: String): DataFrame =
    spark.read.schema(messageSchema).json(spoolDir)

  /** Egress: publish (topic, key, value) rows of `df` through `publisher`,
    * one client per partition per micro-batch, streamed via foreachBatch —
    * no driver collect, no unbounded buffering. */
  def sink(df: DataFrame, publisher: BusPublisher,
      topicCol: String = "topic", keyCol: String = "key",
      valueCol: String = "value"): DataStreamWriter[Row] = {
    df.writeStream.foreachBatch { (batch: DataFrame, epochId: Long) =>
      publishBatch(batch, publisher, topicCol, keyCol, valueCol, epochId)
    }
  }

  /** One micro-batch (or a whole static frame) through the publisher. */
  def publishBatch(batch: DataFrame, publisher: BusPublisher,
      topicCol: String = "topic", keyCol: String = "key",
      valueCol: String = "value", epochId: Long = 0L): Unit = {
    val cols = batch.select(
      col(topicCol).cast("string"), col(keyCol).cast("string"),
      col(valueCol).cast("string"))
    cols.foreachPartition { (it: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      publisher.open(pid, epochId)
      try it.foreach(r => publisher.publish(r.getString(0), r.getString(1), r.getString(2)))
      finally publisher.close()
    }
  }

  /** File-backed reference transport: `publish` spools to a directory — the
    * loopback that makes the contract integration-testable, and a working
    * local bus in its own right (each open() buffers, close() flushes one
    * atomic file per partition). */
  final class SpoolBus(spoolDir: String) extends BusPublisher {
    @transient private var buf: scala.collection.mutable.ArrayBuffer[(String, String, String, Long)] = _
    override def open(partitionId: Long, epochId: Long): Unit =
      buf = scala.collection.mutable.ArrayBuffer.empty
    override def publish(topic: String, key: String, value: String): Unit =
      buf += ((topic, key, value, System.currentTimeMillis()))
    override def close(): Unit = {
      if (buf != null && buf.nonEmpty) appendToSpool(spoolDir, buf.toSeq)
      buf = null
    }
  }
}
