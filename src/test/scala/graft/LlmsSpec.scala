package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import graft.operators.Llms

/** Llms wrapper over the loopback chat-completions double: request shape,
  * retry/backoff, error-as-data, per-executor cache, and the LLM reranker. */
object LlmsSpec {
  // shared JVM state the partition-local clients can hit (local-mode
  // executors share this JVM — the EmbeddersSpec/AsyncTransformerSpec trick)
  val calls = new AtomicInteger(0)
  val fails = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
}

class LlmsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Loopback OpenAI-shape endpoint: replies with a content derived from the
    * LAST message via `fn` over the raw body; `failFirst` 500s the first n
    * requests PER DISTINCT BODY (retry exercise). */
  private def chatServer(fn: String => String, failFirst: Int = 0) = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat/completions",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        LlmsSpec.calls.incrementAndGet()
        val seen = LlmsSpec.fails
          .computeIfAbsent(body, _ => new AtomicInteger(0)).incrementAndGet()
        if (seen <= failFirst) { ex.sendResponseHeaders(500, -1); ex.close() }
        else {
          import org.json4s._
          import org.json4s.jackson.JsonMethods
          val content = JsonMethods.parse(body) \ "messages" match {
            case JArray(ms) => ms.lastOption
              .map(m => (m \ "content").asInstanceOf[JString].s).getOrElse("")
            case _ => ""
          }
          val esc = JsonMethods.compact(JsonMethods.render(JString(fn(content))))
          val resp = s"""{"choices":[{"message":{"role":"assistant","content":$esc}}]}"""
            .getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, resp.length.toLong)
          ex.getResponseBody.write(resp)
          ex.close()
        }
      })
    server.start()
    server
  }

  test("chatComplete via HttpChat: responses land per row, system msg honored") {
    LlmsSpec.fails.clear()
    val server = chatServer(c => s"echo:$c")
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions"
      val out = Llms.chatComplete(
        Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "prompt"),
        col("prompt"),
        () => new Llms.HttpChat(url, "test-model",
          kwargs = Map("temperature" -> 0.0, "max_tokens" -> 32)),
        system = Some("be brief"))
        .collect().map(r => r.getAs[Long]("id") ->
          (r.getAs[String]("response"), r.getAs[String]("response_error"))).toMap
      assert(out(1L) == (("echo:alpha", null)))
      assert(out(2L) == (("echo:beta", null)))
      assert(out(3L) == (("echo:gamma", null)))
    } finally server.stop(0)
  }

  test("chatComplete retries transient failures with backoff, then succeeds") {
    LlmsSpec.fails.clear()
    val server = chatServer(c => s"ok:$c", failFirst = 2)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions"
      val out = Llms.chatComplete(
        Seq((1L, "flaky")).toDF("id", "prompt"), col("prompt"),
        () => new Llms.HttpChat(url, "m"), maxRetries = 3, initialDelayMs = 1)
        .collect().head
      assert(out.getAs[String]("response") == "ok:flaky")
      assert(out.getAs[String]("response_error") == null)
    } finally server.stop(0)
  }

  test("chatComplete: exhausted retries become error rows, not job aborts") {
    LlmsSpec.fails.clear()
    val server = chatServer(identity, failFirst = Int.MaxValue)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions"
      val out = Llms.chatComplete(
        Seq((1L, "doomed"), (2L, "also doomed")).toDF("id", "prompt"),
        col("prompt"),
        () => new Llms.HttpChat(url, "m"), maxRetries = 1, initialDelayMs = 1)
        .collect()
      assert(out.forall(_.getAs[String]("response") == null))
      assert(out.forall(_.getAs[String]("response_error") != null))
    } finally server.stop(0)
  }

  test("cacheSize memoizes repeat prompts per executor (batchSize 1)") {
    LlmsSpec.calls.set(0)
    LlmsSpec.fails.clear()
    val server = chatServer(c => s"c:$c")
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions"
      val df = spark.range(40)
        .select(col("id"), concat(lit("p"), col("id") % 4).as("prompt"))
        .coalesce(1) // one partition → one cache → exact call accounting
      val out = Llms.chatComplete(df, col("prompt"),
        () => new Llms.HttpChat(url, "m"),
        batchSize = 1, cacheSize = 100).collect()
      assert(out.length == 40 && out.forall(_.getAs[String]("response_error") == null))
      assert(LlmsSpec.calls.get == 4,
        s"4 distinct prompts must mean 4 HTTP calls, saw ${LlmsSpec.calls.get}")
    } finally server.stop(0)
  }

  test("rerankLlm: model-scored top-k per query, deterministic ties") {
    // FakeChat rates by counting 'x' marks in the document — a stand-in
    // scorer whose ranking the test can predict exactly
    val chat = () => new Llms.FakeChat(p => {
      val doc = p.substring(p.indexOf("\nDocument: ") + "\nDocument: ".length)
      doc.count(_ == 'x').toString
    })
    val cands = Seq(
      (1L, 10L, "q one", "x"), (1L, 11L, "q one", "xxx"), (1L, 12L, "q one", "xx"),
      (1L, 13L, "q one", "xxx"), // ties 11 on score 3 → smaller id wins rank 1
      (2L, 20L, "q two", ""), (2L, 21L, "q two", "x"))
      .toDF("q_id", "doc_id", "q_text", "d_text")
    val out = Llms.rerankLlm(cands, col("q_id"), col("q_text"),
      col("doc_id"), col("d_text"), chat, k = 2)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank")) ->
        r.getAs[Long]("doc_id")).toMap
    assert(out((1L, 1L)) == 11L, "score 3, smaller id")
    assert(out((1L, 2L)) == 13L, "score 3, larger id")
    assert(out((2L, 1L)) == 21L)
    assert(out((2L, 2L)) == 20L)
  }
}
