package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

import graft.sources.McpServer

/** MCP endpoint over loopback: JSON-RPC initialize / tools/list / tools/call
  * shapes, document-store tools, error conventions. */
class McpServerSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def post(url: String, body: String): (Int, String) = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    conn.getOutputStream.close()
    val code = conn.getResponseCode
    val in = if (code / 100 == 2) conn.getInputStream else conn.getErrorStream
    val resp = if (in == null) "" else new String(in.readAllBytes(), StandardCharsets.UTF_8)
    conn.disconnect()
    (code, resp)
  }

  private def buildServed() = {
    val docs = Seq(
      (1L, "spark is a distributed engine for large scale data processing " +
        "with dataframes and a catalyst optimizer inside"),
      (2L, "the cat sat on a warm mat in the sun and slept through the whole " +
        "afternoon without a single care"),
      (3L, "window functions and joins shuffle data between partitions in a " +
        "distributed query engine at scale")).toDF("doc_id", "text")
    val store = graft.operators.DocumentStore.build(
      docs, col("doc_id"), col("text"), chunkTokens = 30, overlap = 5, dim = 32)
    McpServer.forDocumentStore(store, dim = 32)
  }

  test("initialize + tools/list expose the document-store tool descriptors") {
    val served = buildServed()
    try {
      val url = s"http://127.0.0.1:${served.port}/mcp"
      val (c1, init) = post(url,
        """{"jsonrpc":"2.0","id":1,"method":"initialize","params":{}}""")
      assert(c1 == 200 && init.contains("\"protocolVersion\""), init)
      assert(init.contains("\"graft-mcp\""), init)
      // notifications/initialized has no id → 202, no body
      val (c2, _) = post(url,
        """{"jsonrpc":"2.0","method":"notifications/initialized"}""")
      assert(c2 == 202)
      val (c3, list) = post(url,
        """{"jsonrpc":"2.0","id":2,"method":"tools/list"}""")
      assert(c3 == 200, list)
      for (t <- Seq("retrieve_query", "statistics_query", "answer_query"))
        assert(list.contains(s""""name":"$t""""), list)
      assert(list.contains("\"inputSchema\""), list)
      assert(list.contains("\"required\":[\"query\"]"), list)
    } finally served.stop()
  }

  test("tools/call retrieve_query returns relevant chunks; answer_query answers") {
    val served = buildServed()
    try {
      val url = s"http://127.0.0.1:${served.port}/mcp"
      val (_, r) = post(url,
        """{"jsonrpc":"2.0","id":3,"method":"tools/call","params":{
          |"name":"retrieve_query","arguments":{"query":"distributed data engine","k":2}}}"""
          .stripMargin)
      assert(r.contains("\"isError\":false"), r)
      // content text is an escaped JSON array of 2 chunks, cat doc excluded
      assert("chunk_id".r.findAllIn(r).size == 2, r)
      assert(!r.contains("doc_id\\\":2"), r)
      val (_, stats) = post(url,
        """{"jsonrpc":"2.0","id":4,"method":"tools/call","params":{
          |"name":"statistics_query","arguments":{}}}""".stripMargin)
      assert(stats.contains("doc_count\\\":3"), stats)
      val (_, ans) = post(url,
        """{"jsonrpc":"2.0","id":5,"method":"tools/call","params":{
          |"name":"answer_query","arguments":{"query":"cat in the sun","k":1}}}"""
          .stripMargin)
      assert(ans.contains("doc_id\\\":2"), ans)
    } finally served.stop()
  }

  test("sharded document-store tools: byte-identical to the snapshot server") {
    val docs = Seq(
      (1L, "spark is a distributed engine for large scale data processing " +
        "with dataframes and a catalyst optimizer inside"),
      (2L, "the cat sat on a warm mat in the sun and slept through the whole " +
        "afternoon without a single care"),
      (3L, "window functions and joins shuffle data between partitions in a " +
        "distributed query engine at scale")).toDF("doc_id", "text")
    def store() = graft.operators.DocumentStore.build(
        docs, col("doc_id"), col("text"), chunkTokens = 30, overlap = 5, dim = 32)
      .repartition(5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val snap = McpServer.forDocumentStore(store(), dim = 32)
    val shard = McpServer.forDocumentStore(store(), dim = 32, sharded = true)
    try {
      val calls = Seq(
        """{"jsonrpc":"2.0","id":3,"method":"tools/call","params":{
          |"name":"retrieve_query","arguments":{"query":"distributed data engine","k":2}}}""".stripMargin,
        """{"jsonrpc":"2.0","id":4,"method":"tools/call","params":{
          |"name":"statistics_query","arguments":{}}}""".stripMargin,
        """{"jsonrpc":"2.0","id":5,"method":"tools/call","params":{
          |"name":"answer_query","arguments":{"query":"cat in the sun","k":1}}}""".stripMargin,
        """{"jsonrpc":"2.0","id":6,"method":"tools/call","params":{
          |"name":"list_documents","arguments":{}}}""".stripMargin)
      for (c <- calls) {
        val (_, a) = post(s"http://127.0.0.1:${snap.port}/mcp", c)
        val (_, b) = post(s"http://127.0.0.1:${shard.port}/mcp", c)
        assert(a == b, s"sharded MCP diverges for $c:\n$a\nvs\n$b")
      }
    } finally { snap.stop(); shard.stop() }
  }

  test("list_documents + chat-gated summarize tools (reference register_mcp surface)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val store = graft.operators.DocumentStore.build(
      docs, col("doc_id"), col("text"), chunkTokens = 30, overlap = 5, dim = 32)
    val chat = new graft.operators.Llms.FakeChat(p =>
      s"summary of ${p.linesIterator.count(_.nonEmpty)} lines")
    val served = McpServer.forDocumentStore(store, dim = 32, chat = Some(chat))
    try {
      val url = s"http://127.0.0.1:${served.port}/mcp"
      val (_, list) = post(url, """{"jsonrpc":"2.0","id":1,"method":"tools/list"}""")
      for (t <- Seq("list_documents", "summarize"))
        assert(list.contains(s""""name":"$t""""), list)
      val (c1, inv) = post(url,
        """{"jsonrpc":"2.0","id":2,"method":"tools/call","params":{"name":"list_documents","arguments":{}}}""")
      // tool output rides inside the JSON-escaped text content
      assert(c1 == 200 && inv.contains("\\\"doc_id\\\":1") &&
        inv.contains("\\\"n_chunks\\\""), inv)
      val (c2, sum) = post(url,
        """{"jsonrpc":"2.0","id":3,"method":"tools/call","params":{"name":"summarize","arguments":{"text_list":["a","b"]}}}""")
      assert(c2 == 200 && sum.contains("summary of"), sum)
      // without a chat, summarize is not registered at all
      val servedNoChat = McpServer.forDocumentStore(store, dim = 32)
      try {
        val (_, l2) = post(s"http://127.0.0.1:${servedNoChat.port}/mcp",
          """{"jsonrpc":"2.0","id":4,"method":"tools/list"}""")
        assert(!l2.contains("\"summarize\""), l2)
        assert(l2.contains("\"list_documents\""), l2)
      } finally servedNoChat.stop()
    } finally { served.stop(); store.unpersist() }
  }

  test("error conventions: unknown method/tool are RPC errors, bad args are tool content") {
    val served = buildServed()
    try {
      val url = s"http://127.0.0.1:${served.port}/mcp"
      val (_, m) = post(url, """{"jsonrpc":"2.0","id":6,"method":"nope"}""")
      assert(m.contains("-32601"), m)
      val (_, t) = post(url,
        """{"jsonrpc":"2.0","id":7,"method":"tools/call","params":{"name":"nope"}}""")
      assert(t.contains("-32602"), t)
      // missing required arg → isError:true tool CONTENT, not a protocol error
      val (_, a) = post(url,
        """{"jsonrpc":"2.0","id":8,"method":"tools/call","params":{
          |"name":"retrieve_query","arguments":{}}}""".stripMargin)
      assert(a.contains("\"isError\":true"), a)
      assert(a.contains("missing required argument"), a)
      val (c, p) = post(url, "not json at all")
      assert(c == 400 && p.contains("-32700"), s"$c $p")
    } finally served.stop()
  }
}
