package graft.sources

import org.apache.spark.sql.DataFrame
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import graft.operators.Embedders

/** MCP (Model Context Protocol) serving seam (reference
  * xpacks/llm/mcp_server.py — `McpServer`/`McpServable`/`PathwayMcp`;
  * tool registrations in xpacks/llm/document_store.py:104 `retrieve_query`/
  * `statistics_query` and question_answering.py:406 `retrieve`/`answer`).
  *
  * The reference wraps FastMCP's streamable-http transport around its
  * serving endpoints so any MCP client (an LLM agent) can call the document
  * store as tools. This is the same split as [[QaServer]]: Spark BUILDS the
  * store (distributed job), serving answers from an in-memory snapshot next
  * to the HTTP loop. Here the transport is implemented directly — JSON-RPC
  * 2.0 over HTTP POST with the three MCP methods a tool client needs:
  *
  *   - `initialize`      → protocol/server info + tools capability,
  *   - `tools/list`      → registered [[Tool]] descriptors (name,
  *                         description, JSON-Schema input schema),
  *   - `tools/call`      → dispatch to the tool's handler; handler output
  *                         becomes `content:[{type:"text",text:…}]`, a
  *                         thrown exception becomes `isError:true` content
  *                         (MCP's tool-error convention), and JSON-RPC-level
  *                         errors (unknown method/tool, bad params) use the
  *                         standard -326xx codes.
  *
  * Notifications (requests without `id`, e.g. `notifications/initialized`)
  * are acknowledged with 202 and no body, per streamable-http MCP. */
object McpServer {

  /** One MCP tool: `inputSchema` is a JSON-Schema object literal (string —
    * kept verbatim in `tools/list`); `handler` gets the parsed `arguments`
    * object and returns the text content. */
  final case class Tool(name: String, description: String,
      inputSchema: String, handler: org.json4s.JValue => String)

  final class Served private[McpServer] (val server: HttpServer) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  /** Start an MCP endpoint at `path` serving `tools`. */
  def serve(tools: Seq[Tool], port: Int = 0, path: String = "/mcp"): Served = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val byName = tools.map(t => t.name -> t).toMap

    def jstr(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))

    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
    }

    def rpcResult(id: JValue, result: JValue): JValue =
      JObject(List("jsonrpc" -> JString("2.0"), "id" -> id, "result" -> result))
    def rpcError(id: JValue, code: Int, msg: String): JValue =
      JObject(List("jsonrpc" -> JString("2.0"), "id" -> id,
        "error" -> JObject(List("code" -> JInt(code), "message" -> JString(msg)))))

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext(path, new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          if (ex.getRequestMethod != "POST") { ex.sendResponseHeaders(405, -1); return }
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val req =
            try JsonMethods.parse(body)
            catch { case scala.util.control.NonFatal(_) =>
              respond(ex, 400, jstr(rpcError(JNull, -32700, "parse error"))); return }
          val id = req \ "id"
          val method = req \ "method" match { case JString(m) => m; case _ => "" }
          if (id == JNothing || id == JNull) { // notification: ack, no body
            ex.sendResponseHeaders(202, -1); return
          }
          val resp: JValue = method match {
            case "initialize" => rpcResult(id, JObject(List(
              "protocolVersion" -> JString("2024-11-05"),
              "capabilities" -> JObject(List("tools" -> JObject(Nil))),
              "serverInfo" -> JObject(List(
                "name" -> JString("graft-mcp"), "version" -> JString("1.0"))))))
            case "ping" => rpcResult(id, JObject(Nil))
            case "tools/list" => rpcResult(id, JObject(List(
              "tools" -> JArray(tools.toList.map(t => JObject(List(
                "name" -> JString(t.name),
                "description" -> JString(t.description),
                "inputSchema" -> JsonMethods.parse(t.inputSchema))))))))
            case "tools/call" =>
              val name = req \ "params" \ "name" match { case JString(n) => n; case _ => null }
              byName.get(String.valueOf(name)) match {
                case None => rpcError(id, -32602, s"unknown tool: $name")
                case Some(tool) =>
                  try {
                    val text = tool.handler(req \ "params" \ "arguments")
                    rpcResult(id, JObject(List(
                      "content" -> JArray(List(JObject(List(
                        "type" -> JString("text"), "text" -> JString(text))))),
                      "isError" -> JBool(false))))
                  } catch { // tool failure is CONTENT, not a protocol error
                    case scala.util.control.NonFatal(e) =>
                      rpcResult(id, JObject(List(
                        "content" -> JArray(List(JObject(List(
                          "type" -> JString("text"),
                          "text" -> JString(String.valueOf(e.getMessage)))))),
                        "isError" -> JBool(true))))
                  }
              }
            case m => rpcError(id, -32601, s"method not found: $m")
          }
          respond(ex, 200, jstr(resp))
        } finally ex.close()
      }
    })
    server.start()
    new Served(server)
  }

  /** Wire a built [[graft.operators.DocumentStore]] table as MCP tools —
    * the document_store.py/question_answering.py registrations:
    *
    *   - `retrieve_query(query, k)`  → top-k chunks (JSON rows: chunk_id,
    *     doc_id, score, text), cosine over the snapshot like [[QaServer]],
    *   - `statistics_query()`        → chunk/doc counts of the snapshot,
    *   - `answer_query(query, k)`    → the QaServer `/v2/answer` shape: the
    *     top chunk texts concatenated as context + the top doc id.
    *
    * The store snapshot collects once at serve time (serving-host memory —
    * the reference's in-process index constraint, see [[QaServer]]);
    * `sharded = true` keeps the store in executor-held partitions instead
    * and answers every tool from [[graft.operators.DocumentStore.retrieveSharded]]
    * / small aggregations — identical results (same cosine, same
    * (-score, chunkId) order), no corpus in server memory. */
  def forDocumentStore(store: DataFrame, dim: Int, port: Int = 0,
      path: String = "/mcp", defaultK: Int = 3,
      chat: Option[graft.operators.Llms.ChatModel] = None,
      sharded: Boolean = false): Served = {
    import org.json4s._
    import graft.operators.DocumentStore
    val snapshot: Option[Array[(Long, Long, String, Array[Float])]] =
      if (sharded) None
      else Some(store.select("chunk_id", "doc_id", "chunk_text", "embedding")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getSeq[Float](3).toArray)))
    val embedder = new Embedders.FakeEmbedder(dim)

    def topK(args: JValue): Seq[(Long, Long, String, Double)] = {
      val query = args \ "query" match {
        case JString(q) => q
        case _ => throw new IllegalArgumentException("missing required argument: query")
      }
      val k = args \ "k" match { case JInt(n) => n.toInt; case _ => defaultK }
      val qv = embedder.embedBatch(Seq(query)).head
      snapshot match {
        case Some(entries) =>
          entries.map { case (cid, did, text, vec) =>
            (cid, did, text, DocumentStore.cosineF(qv, vec)) }
            .filter { case (_, _, _, s) => java.lang.Double.isFinite(s) }
            .sortBy { case (cid, _, _, s) => (-s, cid) }
            .take(math.max(k, 0)).toSeq
        case None =>
          DocumentStore.retrieveSharded(store, Seq(0L -> qv), k, expectDim = Some(dim))
            .sortBy(_.rank)
            .map(h => (h.chunkId, h.docId, h.chunkText, h.score)).toSeq
      }
    }

    def docInventory(): Seq[(Long, Long, Long)] = snapshot match {
      case Some(entries) =>
        DocumentStore.docSummary(entries.iterator.map(t => (t._2, t._3)))
      case None => DocumentStore.docSummaryDistributed(store)
    }

    def stats(): (Long, Long) = snapshot match {
      case Some(entries) => (entries.length.toLong, entries.map(_._2).distinct.length.toLong)
      case None =>
        import org.apache.spark.sql.functions.{countDistinct, count, lit, col}
        val r = store.agg(count(lit(1)), countDistinct(col("doc_id"))).head()
        (r.getLong(0), r.getLong(1))
    }

    def esc(s: String): String =
      org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(JString(s)))

    val querySchema =
      """{"type":"object","properties":{"query":{"type":"string"},
        |"k":{"type":"integer"}},"required":["query"]}""".stripMargin
    val tools = Seq(
      Tool("retrieve_query",
        "Top-k most relevant document chunks for a query (cosine over embeddings).",
        querySchema,
        args => topK(args).map { case (cid, did, text, s) =>
          s"""{"chunk_id":$cid,"doc_id":$did,"score":$s,"text":${esc(text)}}"""
        }.mkString("[", ",", "]")),
      Tool("statistics_query",
        "Index statistics: chunk and document counts of the served snapshot.",
        """{"type":"object","properties":{}}""",
        _ => { val (nc, ndoc) = stats()
          s"""{"chunk_count":$nc,"doc_count":$ndoc}""" }),
      Tool("answer_query",
        "Answer a query from the document store: top chunk texts as context plus the best-matching doc id.",
        querySchema,
        args => {
          val top = topK(args)
          if (top.isEmpty) """{"answer":null,"context":[]}"""
          else s"""{"answer":${esc(top.head._3)},"doc_id":${top.head._2},""" +
            s""""context":${top.map(t => esc(t._3)).mkString("[", ",", "]")}}"""
        }),
      // reference question_answering.py:404/431 — list_documents and the
      // summarize MCP tool (the latter needs a chat model)
      Tool("list_documents",
        "Indexed-document inventory: doc_id, chunk and char counts.",
        """{"type":"object","properties":{}}""",
        _ => docInventory().map { case (did, nChunks, nChars) =>
          s"""{"doc_id":$did,"n_chunks":$nChunks,"n_chars":$nChars}"""
        }.mkString("[", ",", "]"))) ++
      chat.map { model =>
        Tool("summarize",
          "Summarize a list of texts into one short summary.",
          """{"type":"object","properties":{"text_list":{"type":"array",
            |"items":{"type":"string"}}},"required":["text_list"]}""".stripMargin,
          args => args \ "text_list" match {
            case JArray(items) if items.forall(_.isInstanceOf[JString]) =>
              val texts = items.collect { case JString(s) => s }
              val out = model.completeBatch(Seq(Seq(graft.operators.Llms
                .ChatMessage("user", graft.operators.Rag.summarizePrompt(texts))))).head
              s"""{"summary":${esc(out)}}"""
            case _ => throw new IllegalArgumentException(
              "missing required argument: text_list")
          })
      }
    serve(tools, port, path)
  }
}
