package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DocumentStore, Llms, Rag}

/** Per-JVM LLM-call counter shared with executor threads (local mode runs
  * them in this JVM; the object is resolved statically, never serialized). */
object RagSpecCalls {
  val calls = new java.util.concurrent.atomic.AtomicInteger
  // top-level functions so chat thunks capture NO spec instance (scalatest's
  // Engine is not serializable)
  // case-insensitive: DocumentStore chunks are lower-cased text
  val oracle: String => String = { prompt =>
    prompt.linesIterator
      .find(_.toLowerCase(java.util.Locale.ROOT).startsWith("fact:"))
      .map(_.drop("fact:".length).trim)
      .getOrElse(graft.operators.Rag.DefaultNoAnswer)
  }
  val countingOracle: String => String = { prompt =>
    calls.incrementAndGet()
    oracle(prompt)
  }
  // the first FOUR invocations fail — one more than chatComplete's
  // in-round attempt budget (1 try + 3 retries), so round 1 exhausts its
  // retries and fails as an error row. Counter is JVM-static for the same
  // serialization reason.
  val flakyCalls = new java.util.concurrent.atomic.AtomicInteger
  val flakyOracle: String => String = { prompt =>
    if (flakyCalls.incrementAndGet() <= 4)
      throw new RuntimeException("transient endpoint failure")
    oracle(prompt)
  }
}

/** Adaptive (geometric) RAG — reference question_answering.py:184
  * (answer_with_geometric_rag_strategy), :819 (AdaptiveRAGQuestionAnswerer)
  * and the servers.py:146-244 route surface. The chat double answers iff
  * its context contains a `FACT:` marker, so document-budget escalation is
  * fully observable. */
class RagSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val filler = (1 to 10).map(i => s"irrelevant filler text number $i")

  test("answerGeometric: easy answers at the starting budget, hard escalates, unanswerable exhausts") {
    val qs = Seq(
      // marker in doc 1: answered in round 1 with 2 docs
      (1L, "what color", Seq("FACT: blue", filler(0), filler(1), filler(2),
        filler(3), filler(4), filler(5), filler(6))),
      // marker at position 6: needs n=8 (round 3)
      (2L, "what number", Seq(filler(0), filler(1), filler(2), filler(3),
        filler(4), "FACT: 42", filler(5), filler(6))),
      // no marker anywhere: exhausts all rounds
      (3L, "what shape", filler.take(8))
    ).toDF("qid", "question", "docs")
    val out = Rag.answerGeometric(qs, col("qid"), col("question"), col("docs"),
        () => new Llms.FakeChat(RagSpecCalls.oracle),
        nStarting = 2, factor = 2, maxIterations = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(out(1L) == (("blue", 2L, 1L, true)))
    assert(out(2L) == (("42", 8L, 3L, true)))
    assert(out(3L) == ((Rag.DefaultNoAnswer, 8L, 3L, false)))
  }

  test("answerGeometric: easy-only workload never pays for wide contexts") {
    // JVM-static counter: task closures serialize even in local mode, so a
    // captured AtomicInteger would count on a deserialized copy
    RagSpecCalls.calls.set(0)
    val qs = (0 until 6).map(i =>
      (i.toLong, s"q$i", Seq(s"FACT: a$i") ++ filler.take(7))).toDF("qid", "q", "docs")
    val out = Rag.answerGeometric(qs, col("qid"), col("q"), col("docs"),
        () => new Llms.FakeChat(RagSpecCalls.countingOracle),
        nStarting = 2, factor = 2, maxIterations = 4).collect()
    assert(out.forall(_.getBoolean(5)))
    assert(out.forall(_.getLong(4) == 1L)) // every question: one round
    // one LLM call per question — a fixed-k=16 RAG would prompt with 8 docs
    // each; the adaptive path asked with 2
    assert(RagSpecCalls.calls.get() == 6,
      s"expected 6 calls, got ${RagSpecCalls.calls.get()}")
    assert(out.forall(_.getLong(3) == 2L))
  }

  test("answerGeometric: a failing chat round becomes a retry, not a job abort") {
    // round 1 throws (chatComplete converts to error rows -> null response
    // -> question stays pending); round 2 answers. The flaky-endpoint
    // contract: transient LLM failures cost one escalation step.
    RagSpecCalls.flakyCalls.set(0)
    val qs = Seq((1L, "q", Seq("FACT: ok") ++ filler.take(3))).toDF("qid", "q", "docs")
    val out = Rag.answerGeometric(qs, col("qid"), col("q"), col("docs"),
        () => new Llms.FakeChat(RagSpecCalls.flakyOracle),
        nStarting = 2, factor = 2, maxIterations = 3).collect()
    assert(out.length == 1 && out(0).getBoolean(5), out.mkString)
    assert(out(0).getString(2) == "ok")
    assert(out(0).getLong(4) == 2L, s"expected answer on round 2: ${out(0)}")
  }

  test("answerGeometricFromStore: retrieval feeds the escalation loop") {
    val docs = Seq(
      (1L, "FACT: spark wins the benchmark on every scale factor measured"),
      (2L, "the cat sat on a warm mat in the sun all afternoon long"),
      (3L, "window functions shuffle data between partitions at scale"))
      .toDF("doc_id", "text")
    val store = DocumentStore.build(docs, col("doc_id"), col("text"),
      chunkTokens = 30, overlap = 5, dim = 32)
    try {
      val qs = Seq((10L, "spark benchmark scale")).toDF("qid", "q")
      val out = Rag.answerGeometricFromStore(store, qs, col("qid"), col("q"),
          () => new Llms.FakeChat(RagSpecCalls.oracle), dim = 32,
          nStarting = 1, factor = 2, maxIterations = 3).collect()
      assert(out.length == 1)
      assert(out(0).getBoolean(5), out(0).toString)
      assert(out(0).getString(2).startsWith("spark wins"), out(0).getString(2))
    } finally store.unpersist()
  }

  private def post(url: String, body: String): (Int, String) = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST"); conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    conn.getOutputStream.close()
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val out = if (is == null) ""
      else new String(is.readAllBytes(), StandardCharsets.UTF_8)
    conn.disconnect()
    (code, out)
  }

  test("QaServer: adaptive answer, list_documents and summarize routes") {
    val docs = Seq(
      (1L, "FACT: the answer is blue and this text talks about colors in " +
        "the sky during the day with scattering"),
      (2L, "the cat sat on a warm mat in the sun and slept through the " +
        "afternoon without a single care at all"),
      (3L, "window functions and joins shuffle data between partitions in " +
        "a distributed query engine at scale"))
      .toDF("doc_id", "text")
    val store = DocumentStore.build(docs, col("doc_id"), col("text"),
      chunkTokens = 30, overlap = 5, dim = 32)
    val calls = new java.util.concurrent.atomic.AtomicInteger
    val served = graft.sources.QaServer.serveRefreshable(store, dim = 32,
      chat = Some(new Llms.FakeChat(p => { calls.incrementAndGet(); RagSpecCalls.oracle(p) })))
    try {
      val base = s"http://127.0.0.1:${served.port}"
      // adaptive: the FACT doc ranks first for this query -> answered in
      // round 1 with the 2-doc starting budget (fixed-k would send k_max=8)
      val (c1, easy) = post(s"$base/v2/answer_adaptive",
        """{"query": "colors in the sky scattering"}""")
      assert(c1 == 200, easy)
      assert(easy.contains(""""answered":true"""), easy)
      assert(easy.contains(""""n_docs_used":2"""), easy)
      assert(easy.contains(""""iterations":1"""), easy)
      assert(calls.get() == 1)
      // unanswerable (served from a fact-free store): escalates through
      // every round, reports noAnswer
      val factless = DocumentStore.build(docs.filter(col("doc_id") > 1),
        col("doc_id"), col("text"), chunkTokens = 30, overlap = 5, dim = 32)
      val served2 = graft.sources.QaServer.serveRefreshable(factless, dim = 32,
        chat = Some(new Llms.FakeChat(p => { calls.incrementAndGet(); RagSpecCalls.oracle(p) })))
      val hard = try {
        val (c2, h) = post(s"http://127.0.0.1:${served2.port}/v2/answer_adaptive",
          """{"query": "cat on the mat", "max_iterations": 3}""")
        assert(c2 == 200, h); h
      } finally { served2.stop(); factless.unpersist() }
      assert(hard.contains(""""answered":false"""), hard)
      assert(hard.contains(""""iterations":3"""), hard)
      assert(hard.contains(s""""response":"${Rag.DefaultNoAnswer}""""), hard)
      assert(calls.get() == 4) // 1 easy + 3 escalation rounds
      // list_documents: one row per doc with chunk/char accounting
      val (c3, listed) = post(s"$base/v2/list_documents", "{}")
      assert(c3 == 200, listed)
      assert(listed.startsWith("""{"results":["""), listed)
      assert("\"doc_id\":".r.findAllIn(listed).size == 3, listed)
      assert(listed.contains(""""n_chunks":"""), listed)
      // summarize: prompt built from text_list, chat reply passed through
      val (c4, sum) = post(s"$base/v2/summarize",
        """{"text_list": ["FACT: condensed", "more text"]}""")
      assert(c4 == 200, sum)
      assert(sum == """{"summary":"condensed"}""", sum)
      // malformed summarize body -> 400
      assert(post(s"$base/v2/summarize", """{"nope": 1}""")._1 == 400)
      // out-of-range adaptive budget -> 400 BEFORE any retrieval or LLM
      // call (a wrapped-negative kMax used to burn maxIter calls for an
      // empty context); the budget guard must not cost a chat call
      val callsBefore = calls.get()
      val (cBudget, budgetErr) = post(s"$base/v2/answer_adaptive",
        """{"query": "x", "max_iterations": 35}""")
      assert(cBudget == 400, budgetErr)
      assert(budgetErr.contains("budget out of range"), budgetErr)
      assert(post(s"$base/v2/answer_adaptive",
        """{"query": "x", "factor": 1000, "max_iterations": 5}""")._1 == 400)
      assert(calls.get() == callsBefore, "rejected budgets must not reach the LLM")
    } finally { served.stop(); store.unpersist() }
  }

  test("QaServer: chat-dependent routes answer 501 when no chat is configured") {
    val docs = Seq((1L, "some text about nothing in particular at all"))
      .toDF("doc_id", "text")
    val store = DocumentStore.build(docs, col("doc_id"), col("text"),
      chunkTokens = 30, overlap = 5, dim = 32)
    val served = graft.sources.QaServer.serveRefreshable(store, dim = 32)
    try {
      val base = s"http://127.0.0.1:${served.port}"
      assert(post(s"$base/v2/summarize", """{"text_list": ["x"]}""")._1 == 501)
      assert(post(s"$base/v2/answer_adaptive", """{"query": "x"}""")._1 == 501)
      // but list_documents works without a chat
      assert(post(s"$base/v2/list_documents", "{}")._1 == 200)
    } finally { served.stop(); store.unpersist() }
  }
}
