package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Http
import java.nio.charset.StandardCharsets

/** HTTP connector over loopback: POSTed JSON rows become a streaming table;
  * batches post back out per partition. */
class HttpSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def post(url: String, body: String): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    conn.getOutputStream.close()
    val resp = new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    conn.disconnect()
    resp
  }

  test("restConnector: POSTed rows land in the streaming table, acked with ids") {
    val spool = java.nio.file.Files.createTempDirectory("graft-http").toString
    val schema = StructType(Seq(
      StructField("user", StringType), StructField("value", LongType)))
    val (server, stream) = Http.restConnector(spark, spool, schema)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/ingest"
      val ack1 = post(url, """{"user":"ann","value":1}""")
      assert(ack1.contains("\"id\""))
      post(url, """{"user":"bob","value":2}""" + "\n" + """{"user":"cat","value":3}""")
      val q = stream.writeStream.format("memory").queryName("http_in")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      val rows = spark.table("http_in").as[(String, Long)].collect().toSet
      assert(rows == Set(("ann", 1L), ("bob", 2L), ("cat", 3L)))
    } finally server.stop(0)
  }

  test("postBatch: one JSON-lines request per partition, failures surface") {
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/sink", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      body.split("\n").filter(_.nonEmpty).foreach(received.add)
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/sink"
      Http.postBatch(Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v"), url)
      val got = received.toArray(Array.empty[String]).toSet
      assert(got == Set("""{"k":"a","v":1}""", """{"k":"b","v":2}""", """{"k":"c","v":3}"""))
    } finally server.stop(0)
  }

  test("postVectors ships id/vector/payload point upserts") {
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/points", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      body.split("\n").filter(_.nonEmpty).foreach(received.add)
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/points"
      val df = Seq((7L, Seq(1.0f, 0.0f), "doc-a"), (8L, Seq(0.5f, 0.5f), "doc-b"))
        .toDF("vec_id", "embedding", "title")
      Http.postVectors(df, "vec_id", "embedding", url)
      val got = received.toArray(Array.empty[String]).toSet
      assert(got == Set(
        """{"id":7,"vector":[1.0,0.0],"payload":{"title":"doc-a"}}""",
        """{"id":8,"vector":[0.5,0.5],"payload":{"title":"doc-b"}}"""))
    } finally server.stop(0)
  }

  test("QaServer: /v2/answer returns top-k chunks for a query over a built store") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "spark is a distributed engine for large scale data processing " +
        "with dataframes and a catalyst optimizer inside"),
      (2L, "the cat sat on a warm mat in the sun and slept through the whole " +
        "afternoon without a single care"),
      (3L, "window functions and joins shuffle data between partitions in a " +
        "distributed query engine at scale")).toDF("doc_id", "text")
    val store = graft.operators.DocumentStore.build(
      docs, col("doc_id"), col("text"), chunkTokens = 30, overlap = 5, dim = 32)
    val server = graft.sources.QaServer.serve(store, dim = 32)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/v2/answer"
      val resp = post(url, """{"query": "distributed data engine", "k": 2}""")
      assert(resp.startsWith("""{"results":["""), resp)
      // two results, and the cat doc is not one of them
      assert("\"chunk_id\":".r.findAllIn(resp).size == 2, resp)
      assert(!resp.contains("\"doc_id\":2"), resp)
      val resp1 = post(url, """{"query": "cat in the sun", "k": 1}""")
      assert(resp1.contains("\"doc_id\":2"), resp1)
      // default k (no "k" in body) returns defaultK=3 results
      val respDef = post(url, """{"query": "distributed data engine"}""")
      assert("\"chunk_id\":".r.findAllIn(respDef).size == 3, respDef)
      // malformed body -> clean 400, not a dropped connection
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write("not json".getBytes(StandardCharsets.UTF_8))
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 400)
      conn.disconnect()
      // empty query embeds to the zero vector: scores are non-finite and
      // dropped, so the response is valid JSON with zero results
      val respEmpty = post(url, """{"query": "", "k": 2}""")
      assert(respEmpty == """{"results":[]}""", respEmpty)
    } finally server.stop(0)
  }

  test("QaServer.refresh: atomic index swap serves the new snapshot without restart") {
    import org.apache.spark.sql.functions.col
    val v1 = Seq((1L, "alpha beta gamma delta epsilon words about nothing at all"))
      .toDF("doc_id", "text")
    val v2 = Seq((2L, "spark catalyst optimizer distributed query engine plan"))
      .toDF("doc_id", "text")
    def store(d: org.apache.spark.sql.DataFrame) = graft.operators.DocumentStore.build(
      d, col("doc_id"), col("text"), chunkTokens = 30, overlap = 5, dim = 32)
    val served = graft.sources.QaServer.serveRefreshable(store(v1), dim = 32)
    try {
      val url = s"http://127.0.0.1:${served.port}/v2/answer"
      assert(post(url, """{"query": "anything", "k": 1}""").contains("\"doc_id\":1"))
      served.refresh(store(v2))
      assert(post(url, """{"query": "anything", "k": 1}""").contains("\"doc_id\":2"))
    } finally served.stop()
  }

  test("statistics/inputs endpoints: file_count, glob- and metadata-filtered input listing") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta words here",
        "pathway/xpacks/llm/tests/test_vector_store.py"),
      (2L, "completely different text about a sleeping cat on a mat",
        "docs/readme.txt")).toDF("doc_id", "text", "path")
    val store = graft.operators.DocumentStore.build(
      docs, col("doc_id"), col("text"), chunkTokens = 30, overlap = 5, dim = 32)
      .join(docs.select(col("doc_id"), col("path")), "doc_id")
      .withColumn("_metadata_path", col("path"))
      .withColumn("_metadata_modified_at",
        to_timestamp(lit("2024-02-28 10:00:00")))
    val served = graft.sources.QaServer.serveRefreshable(store, dim = 32)
    try {
      val stats = post(s"http://127.0.0.1:${served.port}/v1/statistics", "{}")
      assert(stats.contains("\"file_count\":2"), stats)
      assert(!stats.contains("\"last_modified\":null"), stats)
      // test_vs_parsing-style inputs listing: glob narrows to the .py file
      val all = post(s"http://127.0.0.1:${served.port}/v1/inputs", "{}")
      assert(all.contains("test_vector_store.py") && all.contains("readme.txt"))
      val py = post(s"http://127.0.0.1:${served.port}/v1/inputs",
        """{"filepath_globpattern": "**/*.py"}""")
      assert(py.contains("test_vector_store.py") && !py.contains("readme.txt"))
      val byMeta = post(s"http://127.0.0.1:${served.port}/v1/inputs",
        """{"metadata_filter": "contains(path, `readme`)"}""")
      assert(!byMeta.contains("test_vector_store.py") && byMeta.contains("readme.txt"))
      val none = post(s"http://127.0.0.1:${served.port}/v1/inputs",
        """{"filepath_globpattern": "**/*.rs"}""")
      assert(none.contains("\"results\":[]"), none)
    } finally served.stop()
  }

  test("per-query retrieval filters on the answer route (RetrieveQuerySchema metadata_filter/glob)") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta words here",
        "pathway/tests/a.py"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta words here",
        "docs/readme.txt")).toDF("doc_id", "text", "path")
    val store = graft.operators.DocumentStore.build(
      docs, col("doc_id"), col("text"), chunkTokens = 30, overlap = 5, dim = 32)
      .join(docs.select(col("doc_id"), col("path")), "doc_id")
      .withColumn("_metadata_path", col("path"))
    for (sharded <- Seq(Some(false), Some(true))) {
      val served = graft.sources.QaServer.serveRefreshable(store, dim = 32,
        sharded = sharded)
      try {
        val url = s"http://127.0.0.1:${served.port}/v2/answer"
        val all = post(url, """{"query": "alpha", "k": 4}""")
        assert(all.contains("\"doc_id\":1") && all.contains("\"doc_id\":2"))
        val py = post(url, """{"query": "alpha", "k": 4, "filepath_globpattern": "**/*.py"}""")
        assert(py.contains("\"doc_id\":1") && !py.contains("\"doc_id\":2"), s"$sharded: $py")
        val meta = post(url,
          """{"query": "alpha", "k": 4, "metadata_filter": "contains(path, `readme`)"}""")
        assert(!meta.contains("\"doc_id\":1") && meta.contains("\"doc_id\":2"), s"$sharded: $meta")
        val none = post(url, """{"query": "alpha", "k": 4, "filepath_globpattern": "**/*.rs"}""")
        assert(none.contains("\"results\":[]"), s"$sharded: $none")
      } finally served.stop()
    }
  }

  test("QaServer sharded mode: byte-identical responses, refresh still swaps") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "spark is a distributed engine for large scale data processing " +
        "with dataframes and a catalyst optimizer inside"),
      (2L, "the cat sat on a warm mat in the sun and slept through the whole " +
        "afternoon without a single care"),
      (3L, "window functions and joins shuffle data between partitions in a " +
        "distributed query engine at scale")).toDF("doc_id", "text")
    def store() = graft.operators.DocumentStore.build(
      docs, col("doc_id"), col("text"), chunkTokens = 30, overlap = 5, dim = 32)
      .repartition(5) // several executor-held shards
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val snap = graft.sources.QaServer.serveRefreshable(store(), dim = 32)
    val shard = graft.sources.QaServer.serveRefreshable(store(), dim = 32,
      sharded = Some(true))
    try {
      for (q <- Seq("""{"query": "distributed data engine", "k": 2}""",
          """{"query": "cat in the sun", "k": 1}""",
          """{"query": "", "k": 2}""")) { // zero vector → clean empty result
        val a = post(s"http://127.0.0.1:${snap.port}/v2/answer", q)
        val b = post(s"http://127.0.0.1:${shard.port}/v2/answer", q)
        assert(a == b, s"sharded answer diverges for $q")
      }
      val la = post(s"http://127.0.0.1:${snap.port}/v2/list_documents", "{}")
      val lb = post(s"http://127.0.0.1:${shard.port}/v2/list_documents", "{}")
      assert(la == lb, "list_documents diverges")
      // refresh in sharded mode: the new store serves, the old cache releases
      val v2 = Seq((9L, "entirely new corpus about volcanoes and geology rocks"))
        .toDF("doc_id", "text")
      shard.refresh(graft.operators.DocumentStore.build(
        v2, col("doc_id"), col("text"), chunkTokens = 30, overlap = 5, dim = 32))
      val after = post(s"http://127.0.0.1:${shard.port}/v2/answer",
        """{"query": "volcanoes", "k": 1}""")
      assert(after.contains("\"doc_id\":9"), after)
    } finally { snap.stop(); shard.stop() }
  }

  test("QaServer auto-shard: store size picks the index, override wins, refresh re-decides") {
    import org.apache.spark.sql.functions.col
    def store(ids: Long*) = graft.operators.DocumentStore.build(
      ids.map(i => (i, s"document number $i about spark engines and data"))
        .toDF("doc_id", "text"),
      col("doc_id"), col("text"), chunkTokens = 30, overlap = 5, dim = 32)
    // small store, default threshold → snapshot
    val auto = graft.sources.QaServer.serveRefreshable(store(1L), dim = 32)
    // tiny threshold → the SAME store auto-selects sharded
    val tiny = graft.sources.QaServer.serveRefreshable(store(1L), dim = 32,
      autoShardCells = 1L)
    // override beats the threshold in both directions
    val forced = graft.sources.QaServer.serveRefreshable(store(1L), dim = 32,
      sharded = Some(false), autoShardCells = 1L)
    try {
      assert(!auto.isSharded, "small store under the default threshold must snapshot")
      assert(tiny.isSharded, "store above the threshold must auto-shard")
      assert(!forced.isSharded, "explicit override must beat the threshold")
      // refresh re-runs the decision (a grown corpus crosses over without
      // the operator knowing the bound exists) — and still answers
      auto.refresh(store(1L, 2L, 3L))
      assert(!auto.isSharded)
      tiny.refresh(store(1L, 2L, 3L))
      assert(tiny.isSharded)
      val r = post(s"http://127.0.0.1:${tiny.port}/v2/answer",
        """{"query": "spark engines", "k": 1}""")
      assert(r.contains("chunk_id"), r)
    } finally { auto.stop(); tiny.stop(); forced.stop() }
  }
}
