package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Jar-gated Kafka round-trips (reference io/kafka/__init__.py:33 `read` /
  * :541 `write` — Kafka as THE streaming queue). The offline cache has no
  * kafka-clients / spark-sql-kafka / kafka server artifacts (BASELINE.md
  * jar-absence record), so these `assume`-skip today — the LakeFormatSpec
  * pattern. Everything Kafka-side is reflective so this file COMPILES with
  * no kafka jar on the classpath; the moment
  * `spark-sql-kafka-0-10` + `kafka-clients` + the scala `kafka` server jar
  * land, the specs bring up an embedded KRaft broker (format storage →
  * start → create topic via producer auto-create) and run the real
  * `format("kafka")` batch + streaming round-trips with zero code change. */
object KafkaSpec {
  def cls(n: String): Boolean = scala.util.Try(Class.forName(n)).isSuccess
  lazy val clientsPresent = cls("org.apache.kafka.clients.producer.KafkaProducer")
  lazy val sparkKafkaPresent = cls("org.apache.spark.sql.kafka010.KafkaSourceProvider")
  lazy val serverPresent = cls("kafka.server.KafkaRaftServer")

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  /** Embedded single-node KRaft broker, fully reflective. Returns
    * (server, bootstrapServers, stop). Throws on any bring-up failure —
    * callers convert to a canceled test with the failure message. */
  def startBroker(): (AnyRef, String, () => Unit) = {
    val logDir = java.nio.file.Files.createTempDirectory("graft-kraft").toString
    val brokerPort = freePort()
    val ctrlPort = freePort()
    val props = new java.util.Properties()
    props.put("process.roles", "broker,controller")
    props.put("node.id", "1")
    props.put("controller.quorum.voters", s"1@127.0.0.1:$ctrlPort")
    props.put("listeners", s"PLAINTEXT://127.0.0.1:$brokerPort,CONTROLLER://127.0.0.1:$ctrlPort")
    props.put("advertised.listeners", s"PLAINTEXT://127.0.0.1:$brokerPort")
    props.put("inter.broker.listener.name", "PLAINTEXT")
    props.put("controller.listener.names", "CONTROLLER")
    props.put("listener.security.protocol.map", "PLAINTEXT:PLAINTEXT,CONTROLLER:PLAINTEXT")
    props.put("log.dirs", logDir)
    props.put("offsets.topic.replication.factor", "1")
    props.put("transaction.state.log.replication.factor", "1")
    props.put("transaction.state.log.min.isr", "1")
    props.put("group.initial.rebalance.delay.ms", "0")
    props.put("auto.create.topics.enable", "true")

    // format storage via the StorageTool CLI (stable across 3.x/4.x), with
    // Exit overridden so its terminal exit(0) doesn't kill the test JVM
    val cfgFile = java.nio.file.Files.createTempFile("graft-kraft", ".properties")
    val out = new java.io.FileOutputStream(cfgFile.toFile)
    try props.store(out, "embedded kraft") finally out.close()
    val exitCls = Class.forName("org.apache.kafka.common.utils.Exit")
    val procCls = Class.forName("org.apache.kafka.common.utils.Exit$Procedure")
    val noExit = java.lang.reflect.Proxy.newProxyInstance(procCls.getClassLoader,
      Array(procCls), (_, _, _) => null)
    exitCls.getMethod("setExitProcedure", procCls).invoke(null, noExit)
    try {
      val uuidCls = Class.forName("org.apache.kafka.common.Uuid")
      val clusterId = uuidCls.getMethod("toString")
        .invoke(uuidCls.getMethod("randomUuid").invoke(null)).toString
      val storageTool = Class.forName("kafka.tools.StorageTool")
      storageTool.getMethod("main", classOf[Array[String]]).invoke(null,
        Array[String]("format", "-t", clusterId, "-c", cfgFile.toString))
    } finally exitCls.getMethod("resetExitProcedure").invoke(null)

    // new KafkaRaftServer(KafkaConfig, Time) — try the known ctor shapes
    val cfgCls = Class.forName("kafka.server.KafkaConfig")
    val config: AnyRef = cfgCls.getConstructors
      .collectFirst {
        case c if c.getParameterTypes.sameElements(Array(classOf[java.util.Map[_, _]])) =>
          c.newInstance(props).asInstanceOf[AnyRef]
        case c if c.getParameterTypes.sameElements(Array(classOf[java.util.Properties])) =>
          c.newInstance(props).asInstanceOf[AnyRef]
      }
      .getOrElse {
        val apply = cfgCls.getMethod("apply", classOf[java.util.Map[_, _]])
        apply.invoke(null, props)
      }
    val timeCls = Class.forName("org.apache.kafka.common.utils.Time")
    val sysTime = timeCls.getField("SYSTEM").get(null)
    val srvCls = Class.forName("kafka.server.KafkaRaftServer")
    val server = srvCls.getConstructor(cfgCls, timeCls)
      .newInstance(config, sysTime).asInstanceOf[AnyRef]
    srvCls.getMethod("startup").invoke(server)
    (server, s"127.0.0.1:$brokerPort", () => {
      srvCls.getMethod("shutdown").invoke(server); ()
    })
  }

  /** Reflective KafkaProducer: send (key, value) string pairs, flush, close. */
  def produce(bootstrap: String, topic: String, kvs: Seq[(String, String)]): Unit = {
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrap)
    props.put("key.serializer", "org.apache.kafka.common.serialization.StringSerializer")
    props.put("value.serializer", "org.apache.kafka.common.serialization.StringSerializer")
    val pCls = Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
    val rCls = Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
    val producer = pCls.getConstructor(classOf[java.util.Properties]).newInstance(props)
    try {
      val send = pCls.getMethod("send", rCls)
      kvs.foreach { case (k, v) =>
        val rec = rCls.getConstructor(classOf[String], classOf[Object], classOf[Object])
          .newInstance(topic, k, v)
        send.invoke(producer, rec.asInstanceOf[AnyRef])
          .asInstanceOf[java.util.concurrent.Future[_]].get()
      }
    } finally pCls.getMethod("close").invoke(producer)
  }
}

class KafkaSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def withBroker(body: String => Unit): Unit = {
    val (_, bootstrap, stop) =
      try KafkaSpec.startBroker()
      catch { case e: Throwable =>
        cancel(s"embedded KRaft bring-up failed on this kafka version: $e") }
    try body(bootstrap) finally stop()
  }

  test("kafka batch round-trip: df write format(kafka) → batch read back " +
      "(auto-enables when kafka jars present)") {
    assume(KafkaSpec.clientsPresent && KafkaSpec.sparkKafkaPresent &&
      KafkaSpec.serverPresent,
      "kafka-clients / spark-sql-kafka / kafka server jars absent (BASELINE.md)")
    import spark.implicits._
    withBroker { bootstrap =>
      Seq(("k1", "v1"), ("k2", "v2"), ("k3", "v3")).toDF("key", "value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", "graft_batch").save()
      val back = spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", "graft_batch")
        .option("startingOffsets", "earliest").load()
        .select(col("key").cast("string"), col("value").cast("string"))
        .as[(String, String)].collect().toSet
      assert(back == Set(("k1", "v1"), ("k2", "v2"), ("k3", "v3")))
    }
  }

  test("kafka streaming read via Connectors.kafka + streaming write sink " +
      "(auto-enables when kafka jars present)") {
    assume(KafkaSpec.clientsPresent && KafkaSpec.sparkKafkaPresent &&
      KafkaSpec.serverPresent,
      "kafka-clients / spark-sql-kafka / kafka server jars absent (BASELINE.md)")
    import spark.implicits._
    withBroker { bootstrap =>
      KafkaSpec.produce(bootstrap, "graft_in",
        Seq(("a", "1"), ("b", "2"), ("c", "3")))
      // reference read: streaming source → memory sink
      val q = graft.sources.Connectors.kafka(spark, bootstrap, "graft_in")
        .select(col("key").cast("string"), col("value").cast("string"))
        .writeStream.format("memory").queryName("kafka_in")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-kafka-ck").toString)
        .start()
      q.awaitTermination(120000)
      val got = spark.table("kafka_in").as[(String, String)].collect().toSet
      assert(got == Set(("a", "1"), ("b", "2"), ("c", "3")))
      // reference write: stream back out to a second topic, read it batch
      implicit val sqlCtx = spark.sqlContext
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
      ms.addData(("x", "9"))
      val q2 = ms.toDS().toDF("key", "value")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", "graft_out")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-kafka-ck2").toString)
        .start()
      q2.processAllAvailable(); q2.stop()
      val out = spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", "graft_out")
        .option("startingOffsets", "earliest").load()
        .select(col("key").cast("string"), col("value").cast("string"))
        .as[(String, String)].collect().toSet
      assert(out == Set(("x", "9")))
    }
  }
}
