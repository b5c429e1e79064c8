package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.Udfs

/** LLM chat wrapper layer (reference python/pathway/xpacks/llm/llms.py —
  * `BaseChat`/`OpenAIChat`/`LiteLLMChat`/`HFPipelineChat`; scorer seam
  * reference xpacks/llm/rerankers.py:40 `LLMReranker`).
  *
  * The reference wraps chat models as async UDFs with four orthogonal knobs:
  * capacity (max concurrent calls), retry strategy, cache strategy, and
  * model kwargs. The Spark-first mapping:
  *
  *   - named model classes → [[ChatModel]] implementations: [[HttpChat]]
  *     (OpenAI-style chat-completions over HTTP, one client per partition —
  *     LiteLLM-style endpoint portability via `url` + `model` + kwargs) and
  *     [[FakeChat]] (deterministic in-process double, the HFPipelineChat
  *     local-model role; no model libs ship in this container so specs use
  *     the loopback HTTP server / pure function),
  *   - capacity → `coalesce(capacity)`: concurrent in-flight batches ARE
  *     partitions here (udfs/executors.py async capacity),
  *   - retry_strategy → exponential backoff around each batch call
  *     ([[Udfs.withRetries]], udfs/retries.py ExponentialBackoffRetryStrategy),
  *   - cache_strategy → per-executor memoization ([[Udfs.cached]],
  *     udfs/caches.py InMemoryCache; single-row batches only, same contract
  *     as [[AsyncTransformer.transform]]),
  *   - failures become DATA (`<out>_error` column), not job aborts — the
  *     AsyncTransformer error-row contract.
  *
  * Everything is per-partition streaming with no shuffle and no driver
  * round-trips: at 100 TB the calls fan out with the data.
  */
object Llms {

  final case class ChatMessage(role: String, content: String)

  /** A chat model: one response per message-list. Implementations must be
    * Serializable (constructed per partition via a `() => ChatModel` thunk,
    * so only the FACTORY ships; the client itself never serializes). */
  trait ChatModel {
    def model: String
    /** Must return exactly one response per request, in order. */
    def completeBatch(batch: Seq[Seq[ChatMessage]]): Seq[String]
  }

  /** OpenAI-style chat-completions client (llms.py OpenAIChat semantics;
    * LiteLLM portability = point `url` at any compatible endpoint):
    * `POST url` with `{"model":…, "messages":[{"role":…,"content":…}…],
    * …kwargs}` → `choices[0].message.content`. JSON via json4s (on Spark's
    * classpath). `kwargs` values may be String / Int / Long / Double /
    * Boolean (temperature, max_tokens, …— llms.py model kwargs). */
  final class HttpChat(url: String, val model: String,
      kwargs: Map[String, Any] = Map.empty, timeoutMs: Int = 30000)
      extends ChatModel {
    import org.json4s._
    import org.json4s.jackson.JsonMethods

    private def jval(v: Any): JValue = v match {
      case s: String => JString(s)
      case i: Int => JInt(i)
      case l: Long => JInt(l)
      case d: Double => JDouble(d)
      case b: Boolean => JBool(b)
      case other => JString(String.valueOf(other))
    }

    private def completeOne(messages: Seq[ChatMessage]): String = {
      val body = JsonMethods.compact(JsonMethods.render(JObject(List(
        "model" -> JString(model),
        "messages" -> JArray(messages.toList.map(m => JObject(List(
          "role" -> JString(m.role), "content" -> JString(m.content)))))) ++
        kwargs.toList.sortBy(_._1).map { case (k, v) => k -> jval(v) })))
      val conn = java.net.URI.create(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod("POST")
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/json")
        conn.getOutputStream.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val code = conn.getResponseCode
        if (code / 100 != 2) throw new java.io.IOException(s"HTTP $code from $url")
        val resp = new String(conn.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        JsonMethods.parse(resp) \ "choices" match {
          case JArray(first :: _) => first \ "message" \ "content" match {
            case JString(c) => c
            case _ => throw new java.io.IOException(s"no message.content in: $resp")
          }
          case _ => throw new java.io.IOException(s"no choices in: $resp")
        }
      } finally conn.disconnect()
    }

    override def completeBatch(batch: Seq[Seq[ChatMessage]]): Seq[String] =
      batch.map(completeOne) // chat APIs are one-completion-per-call
  }

  /** Deterministic in-process double (the HFPipelineChat local-model slot):
    * `fn` maps the LAST message's content to the response. */
  final class FakeChat(fn: String => String, val model: String = "fake")
      extends ChatModel {
    override def completeBatch(batch: Seq[Seq[ChatMessage]]): Seq[String] =
      batch.map(ms => fn(ms.lastOption.map(_.content).getOrElse("")))
  }

  /** Run `promptCol` of every row through `chat`, appending `outCol` (the
    * response) and `<outCol>_error` (null on success; failures are data).
    * `system` prepends a system message. `capacity` > 0 caps concurrent
    * in-flight batches by coalescing to that many partitions. `cacheSize`
    * > 0 memoizes per-prompt responses per executor (batchSize 1 only —
    * the [[AsyncTransformer]] cache contract). */
  def chatComplete(df: DataFrame, promptCol: Column, chat: () => ChatModel,
      system: Option[String] = None, batchSize: Int = 16, maxRetries: Int = 3,
      initialDelayMs: Long = 10, cacheSize: Int = 0, capacity: Int = 0,
      outCol: String = "response"): DataFrame = {
    val withPrompt = df.withColumn("_llm_prompt", promptCol)
    val pIdx = withPrompt.schema.fieldIndex("_llm_prompt")
    val outSchema = withPrompt.schema
      .add(outCol, StringType).add(s"${outCol}_error", StringType)
    val limited = if (capacity > 0) withPrompt.coalesce(capacity) else withPrompt
    val sys = system
    val kerneled = limited.mapPartitions { it =>
      val client = chat()
      def msgs(prompt: String): Seq[ChatMessage] =
        sys.map(ChatMessage("system", _)).toSeq :+ ChatMessage("user", prompt)
      val callBatch: Seq[String] => Seq[String] =
        if (cacheSize > 0 && batchSize == 1) {
          val one = Udfs.cached[String, String](
            p => Udfs.withRetries(maxRetries, initialDelayMs)(() =>
              client.completeBatch(Seq(msgs(p))).head),
            cacheSize)
          ps => ps.map(one)
        } else {
          ps => Udfs.withRetries(maxRetries, initialDelayMs)(() =>
            client.completeBatch(ps.map(msgs)))
        }
      it.grouped(batchSize).flatMap { batch =>
        val prompts = batch.map(r => String.valueOf(r.getString(pIdx)))
        try {
          val outs = callBatch(prompts)
          require(outs.size == batch.size,
            s"model returned ${outs.size} responses for ${batch.size} prompts")
          batch.lazyZip(outs).map((r, o) => Row.fromSeq(r.toSeq :+ o :+ null))
        } catch {
          case e: Throwable =>
            val msg = String.valueOf(e.getMessage)
            batch.map(r => Row.fromSeq(r.toSeq :+ null :+ msg))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    kerneled.select((df.columns.toSeq :+ outCol :+ s"${outCol}_error").map(col): _*)
  }

  /** LLM reranker (rerankers.py:40 LLMReranker + rerank_topk_filter): ask the
    * model to rate each (query, document) pair 1–5, parse the first number in
    * the reply, keep the top-`k` docs per query (ties → smaller doc id — the
    * deterministic order every ranking op in this repo uses). Unparseable or
    * failed replies are EXCLUDED from ranking (their error is not silently a
    * zero score). Returns (q_id, doc_id, score, rank). */
  /** prompts.parse_score_json (prompts.py:312; r16 decode of
    * test_llm_reranker): the LLM reply must be JSON with a `score` member —
    * `float(int(json.loads(text)["score"]))`, truncating a fractional score
    * toward zero; anything unparseable raises the reference's ValueError
    * verbatim instead of scoring 0. */
  def parseScoreJson(c: Column): Column = {
    val raw = get_json_object(c, "$.score")
    when(raw.isNotNull && raw.cast("double").isNotNull,
        raw.cast("double").cast("long").cast("double"))
      .otherwise(raise_error(concat(
        lit("Expected a json response, got `"), c, lit("`."))).cast("double"))
  }

  /** rerankers.rerank_topk_filter (rerankers.py:17; r16 decode of
    * test_rerank_topk_filter): per ROW, sort the parallel doc/score lists by
    * score DESCENDING with python sorted's STABILITY (equal scores keep
    * their original order) and keep the first k of each. Pure builtin HOFs —
    * index-tagged structs sorted by (−score, index). Returns
    * struct(docs, scores). */
  def rerankTopkFilter(docs: Column, scores: Column, k: Int): Column = {
    // sequence(0, -1) would step BACKWARD for an empty list — guard the
    // empty case to empty outputs (the reference returns ((), ()))
    val idx = when(size(scores) > 0, sequence(lit(0), size(scores) - 1))
      .otherwise(slice(sequence(lit(0), lit(0)), 1, 0))
    val tagged = zip_with(scores, idx,
      (s, i) => struct(s.as("score"), i.as("i")))
    val sorted = array_sort(tagged, (a, b) =>
      when(a("score") > b("score"), -1)
        .when(a("score") < b("score"), 1)
        .otherwise((a("i") - b("i")).cast("int")))
    val top = slice(sorted, 1, k)
    struct(
      transform(top, t => element_at(docs, t("i").cast("int") + 1)).as("docs"),
      transform(top, t => t("score")).as("scores"))
  }

  def rerankLlm(candidates: DataFrame, queryId: Column, qText: Column,
      docId: Column, dText: Column, chat: () => ChatModel, k: Int,
      batchSize: Int = 16, maxRetries: Int = 3): DataFrame = {
    val base = candidates.select(queryId.as("q_id"), docId.as("doc_id"),
      concat(lit("Rate the relevance of the document to the query on a scale of 1 to 5. Respond with a single number.\nQuery: "),
        qText, lit("\nDocument: "), dText).as("_p"))
    val scored = chatComplete(base, col("_p"), chat,
      batchSize = batchSize, maxRetries = maxRetries, outCol = "_resp")
      .withColumn("score",
        regexp_extract(col("_resp"), "(\\d+(\\.\\d+)?)", 1).cast("double"))
      .filter(col("score").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    scored.select(col("q_id"), col("doc_id"), col("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
