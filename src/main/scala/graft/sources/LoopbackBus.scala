package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** In-JVM loopback message broker — a NAMED transport over the
  * [[MessageBus]] SPI (reference io/nats read:24 / write:213 option
  * surface): topics are dot-separated subjects, subscriptions take
  * NATS-style patterns (`*` = one token, `>` = tail), delivery is QoS-0
  * (fire-and-forget fan-out to current subscribers, no persistence, no
  * redelivery — exactly a core-NATS publish).
  *
  * Scope: the broker registry is static per JVM, so this is a working bus
  * under `local[k]` (driver and executors share the JVM — the loopback twin
  * of `pw.demo`'s in-process streams) and the integration harness for the
  * SPI contract. A networked adapter (NATS/MQTT/Kinesis client) implements
  * the same [[MessageBus.BusPublisher]] + subscribe-to-spool pair against a
  * remote endpoint; nothing Spark-side changes.
  */
object LoopbackBus {

  /** NATS subject match: dot-separated tokens, `*` matches exactly one
    * token, a trailing `>` matches one-or-more remaining tokens. NATS
    * grammar only permits `>` as the FINAL token — mid-pattern it is an
    * ordinary literal (so `a.>.b` matches only the literal subject
    * `a.>.b`, never over-matching `a.x.y`). */
  def subjectMatches(pattern: String, subject: String): Boolean = {
    val p = pattern.split('.'); val s = subject.split('.')
    var i = 0
    while (i < p.length) {
      if (p(i) == ">" && i == p.length - 1) return i < s.length // tail wildcard needs ≥1 token
      if (i >= s.length || (p(i) != "*" && p(i) != s(i))) return false
      i += 1
    }
    p.length == s.length
  }

  /** One named broker: subscriber fan-out with per-subscription patterns. */
  final class Broker {
    private val subs =
      new ConcurrentHashMap[Long, (String, (String, String, String, Long) => Unit)]()
    private val ids = new AtomicLong()

    /** Register a callback for subjects matching `pattern`; returns the
      * subscription id for [[unsubscribe]]. */
    def subscribe(pattern: String)(cb: (String, String, String, Long) => Unit): Long = {
      val id = ids.incrementAndGet()
      subs.put(id, (pattern, cb))
      id
    }

    def unsubscribe(id: Long): Unit = subs.remove(id)

    /** QoS-0 publish: deliver to every currently-matching subscription,
      * return the delivery count (0 = dropped, as core NATS does). */
    def publish(topic: String, key: String, value: String): Int = {
      val ts = System.currentTimeMillis()
      var n = 0
      subs.forEach { (_, sub) =>
        if (subjectMatches(sub._1, topic)) { sub._2(topic, key, value, ts); n += 1 }
      }
      n
    }
  }

  private val brokers = new ConcurrentHashMap[String, Broker]()

  /** The named broker, created on first use (`loopback://name`). */
  def broker(name: String): Broker = brokers.computeIfAbsent(name, _ => new Broker)

  /** Drop a broker and its subscriptions (test teardown). */
  def drop(name: String): Unit = brokers.remove(name)

  /** Egress SPI adapter: publishes straight into the named broker. */
  final class Publisher(busName: String) extends MessageBus.BusPublisher {
    override def open(partitionId: Long, epochId: Long): Unit = ()
    override def publish(topic: String, key: String, value: String): Unit =
      broker(busName).publish(topic, key, value)
    override def close(): Unit = ()
  }

  /** io/nats-style `read`: subscribe `topicPattern` on the named broker,
    * spool deliveries, and return the streaming DataFrame over the spool
    * (schema [[MessageBus.messageSchema]]) plus the subscription id to
    * unsubscribe on teardown. */
  def read(spark: SparkSession, busName: String, topicPattern: String,
      spoolDir: String): (DataFrame, Long) = {
    val subId = broker(busName).subscribe(topicPattern) { (t, k, v, ts) =>
      MessageBus.appendToSpool(spoolDir, Seq((t, k, v, ts)))
    }
    (MessageBus.source(spark, spoolDir), subId)
  }

  /** io/nats-style `write`: stream `df` into the named broker; the topic is
    * a per-row column (pass a literal column for the fixed-topic form). */
  def write(df: DataFrame, busName: String, topicCol: String = "topic",
      keyCol: String = "key", valueCol: String = "value"): DataStreamWriter[Row] =
    MessageBus.sink(df, new Publisher(busName), topicCol, keyCol, valueCol)
}
