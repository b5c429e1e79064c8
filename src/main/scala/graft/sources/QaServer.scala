package graft.sources

import org.apache.spark.sql.DataFrame
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import graft.operators.{DocumentStore, Embedders, Llms, Rag}

/** Question-answering REST endpoint (reference xpacks/llm/question_answering
  * .py — `BaseRAGQuestionAnswerer` serves `/v2/answer` over a DataIndex;
  * `AdaptiveRAGQuestionAnswerer` (:819) adds the geometric-escalation
  * answer path; routing in xpacks/llm/servers.py:146-244, which also
  * exposes `/v2/list_documents` and `/v2/summarize`).
  *
  * The split mirrors the reference's own architecture: the dataflow side
  * BUILDS and refreshes the index (here: `DocumentStore.build`, a Spark
  * job), while serving runs in-process over that index's snapshot — the
  * reference keeps its usearch/tantivy index in the server's memory next to
  * the HTTP loop, not inside the dataflow either. So `serve` collects the
  * (chunk_id, doc_id, chunk_text, embedding) store once and answers queries
  * from local memory; the snapshot must fit the serving host, the identical
  * constraint the reference's in-process index has. Re-`serve` (or swap the
  * handler) after rebuilding the store to refresh — the Spark side stays
  * fully distributed.
  *
  * Protocol: `POST <path>` body `{"query": "...", "k": 3}` →
  * `{"results": [{"chunk_id":…, "doc_id":…, "score":…, "text":…}, …]}`.
  * JSON in/out via json4s (already on Spark's classpath).
  */
object QaServer {

  /** Embedding cells (rows × dim) above which `serve`/`serveRefreshable`
    * pick the sharded index when `sharded` is not overridden: 64M float
    * cells ≈ 256 MB of raw embeddings (text payload on top) — past that a
    * collected snapshot stops being a safe "fits the serving host"
    * assumption and [[DocumentStore.retrieveSharded]]'s distributed path
    * wins. The decision re-runs on every `refresh`, so a growing corpus
    * crosses over without the operator knowing the bound exists; the
    * sizing count is one cheap job against the (normally persisted)
    * store. */
  val DefaultAutoShardCells: Long = 64L * 1024L * 1024L

  private def pickSharded(store: DataFrame, dim: Int,
      sharded: Option[Boolean], autoShardCells: Long): Boolean =
    sharded.getOrElse(store.count() * dim > autoShardCells)

  private final case class Entry(chunkId: Long, docId: Long, text: String,
      vec: Array[Float], path: String = null)

  /** The serving index behind every route: ranked top-k plus the
    * list_documents inventory. Two implementations — the collected
    * snapshot (default; the reference's own in-server-memory shape) and
    * the sharded store ([[DocumentStore.retrieveSharded]]: the corpus
    * stays distributed, only per-shard top-k rows reach the server). Both
    * rank under the same (-score, chunkId) order with the same cosine, so
    * answers are bit-identical (DocumentStoreSpec pins it). */
  private sealed trait Index {
    def top(qv: Array[Float], k: Int): Array[(Entry, Double)] = top(qv, k, null)
    /** `filter` is a merged IndexFilter string evaluated against each
      * chunk's file metadata BEFORE ranking (pre-filtered exact top-k — the
      * DocumentStore.retrieve contract); null accepts everything. */
    def top(qv: Array[Float], k: Int, filter: String): Array[(Entry, Double)]
    /** (docId, nChunks, nChars) sorted by docId. */
    def docSummary: Seq[(Long, Long, Long)]
    /** (path, modified_at µs) per distinct input file — the
      * statistics/inputs surface (vector_store.py statistics_query /
      * inputs_query). Empty when the store carries no `_metadata_path`. */
    def fileInventory: Seq[(String, Option[Long])]
    /** Cache owned by this index to release when superseded. */
    def backing: Option[DataFrame]
  }

  /** Distinct (path, max modified_at) over the store's metadata columns —
    * one small aggregation, ships one row per input file. */
  private def fileInventoryOf(store: DataFrame): Seq[(String, Option[Long])] = {
    import org.apache.spark.sql.functions.{col, max, unix_micros}
    if (!store.columns.contains("_metadata_path")) Seq.empty
    else {
      val agg =
        if (store.columns.contains("_metadata_modified_at"))
          store.groupBy("_metadata_path")
            .agg(max(unix_micros(
              col("_metadata_modified_at").cast("timestamp_ltz"))).as("_m"))
        else store.select(col("_metadata_path")).distinct()
          .withColumn("_m", org.apache.spark.sql.functions.lit(null).cast("long"))
      agg.orderBy("_metadata_path").collect()
        .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
    }
  }

  private final class SnapshotIndex(entries: Array[Entry],
      owned: DataFrame) extends Index {
    // lazy: the inventory job runs on the FIRST statistics/inputs request,
    // not on every index rebuild
    private lazy val inv = fileInventoryOf(owned)
    def fileInventory: Seq[(String, Option[Long])] = inv
    def top(qv: Array[Float], k: Int, filter: String): Array[(Entry, Double)] =
      entries.iterator
        .filter(e => filter == null || graft.functions.IndexFilter.matches(filter,
          if (e.path == null) Map.empty else Map("path" -> e.path)))
        .map(e => (e, DocumentStore.cosineF(qv, e.vec)))
        .filter { case (_, s) => java.lang.Double.isFinite(s) }
        .toArray
        .sortBy { case (e, s) => (-s, e.chunkId) }
        .take(math.max(k, 0))
    def docSummary: Seq[(Long, Long, Long)] =
      DocumentStore.docSummary(entries.iterator.map(e => (e.docId, e.text)))
    def backing: Option[DataFrame] = Option(owned)
  }

  /** Corpus-scale index: each request runs a short Spark job over the
    * persisted store's executor-held partitions. Latency trades job
    * launch (~tens of ms) for removing the driver/server-memory bound —
    * the store never materializes in one process. */
  private final class ShardedIndex(store: DataFrame, dim: Int) extends Index {
    // CHEAP construction-time probe (first row only, one short job): a
    // uniformly mis-dimensioned store — the common operator error — must
    // fail INSIDE refresh(), before the healthy index is unpersisted and
    // every request starts 500ing. Mixed per-row corruption still fails
    // fast inside the retrieval scan itself (expectDim below); a full
    // validation pass per refresh is NOT run — at the corpus scale this
    // index exists for, that would be a whole extra job.
    locally {
      import org.apache.spark.sql.functions.col
      store.select(col("chunk_id"), col("embedding")).head(1).foreach { r =>
        val n = r.getSeq[Float](1).length
        if (n != dim) throw new IllegalArgumentException(
          s"store embedding dim $n != serve dim $dim (chunk ${r.getLong(0)})")
      }
    }
    def top(qv: Array[Float], k: Int, filter: String): Array[(Entry, Double)] = {
      // the filter prunes the DISTRIBUTED scan before per-shard top-k — the
      // same pre-filtered exact-top-k contract as the snapshot path
      val base =
        if (filter == null) store
        else if (!store.columns.contains("_metadata_path")) {
          // consistency with SnapshotIndex (r17, ADVICE): a store without
          // metadata evaluates the filter against EMPTY metadata — the same
          // filtered query must not flip between all-hits and no-hits when
          // serve() auto-selects snapshot vs sharded by store size
          if (graft.functions.IndexFilter.matches(filter, Map.empty[String, String])) store
          else store.limit(0)
        } else {
          val f = filter
          val matchUdf = org.apache.spark.sql.functions.udf((p: String) =>
            graft.functions.IndexFilter.matches(f,
              if (p == null) Map.empty[String, String] else Map("path" -> p)))
          store.filter(matchUdf(org.apache.spark.sql.functions.col("_metadata_path")))
        }
      DocumentStore.retrieveSharded(base, Seq(0L -> qv), k, expectDim = Some(dim))
        .sortBy(_.rank)
        .map(h => (Entry(h.chunkId, h.docId, h.chunkText, Array.emptyFloatArray), h.score))
    }
    def docSummary: Seq[(Long, Long, Long)] =
      DocumentStore.docSummaryDistributed(store)
    private lazy val inv = fileInventoryOf(store)
    def fileInventory: Seq[(String, Option[Long])] = inv
    def backing: Option[DataFrame] = Some(store)
  }

  /** A served endpoint whose index can be refreshed in place: call
    * `refresh(newStore)` after the Spark side rebuilds the store and the
    * next request answers from the new snapshot — an atomic reference swap,
    * so serving never pauses (the reference's servers update their index
    * from the live dataflow the same way).
    *
    * Cache-lifecycle OWNERSHIP: every store handed to `serveRefreshable` or
    * `refresh` belongs to the endpoint from that point on — when a refresh
    * supersedes it (including the initial store on the FIRST refresh), it is
    * `unpersist`ed, a no-op if the caller never persisted it. Callers that
    * want to keep using a superseded store's cache must re-persist it. */
  final class Served private[QaServer] (val server: HttpServer,
      ref: java.util.concurrent.atomic.AtomicReference[Index],
      mkIndex: DataFrame => Index) {
    /** Swap in a rebuilt store; the superseded store's cache is released
      * after the swap (snapshot mode: its rows lived on in the collected
      * snapshot; sharded mode: an in-flight request on the old index
      * recomputes from the plan — slower, never wrong). */
    def refresh(store: DataFrame): Unit = synchronized {
      val old = ref.get()
      ref.set(mkIndex(store))
      old.backing.foreach(_.unpersist(false))
    }
    /** Whether the CURRENT index is the sharded one (auto-selection or
      * override outcome — specs pin the switchover through this). */
    def isSharded: Boolean = ref.get().isInstanceOf[ShardedIndex]
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  private def collectEntries(store: DataFrame, dim: Int): Array[Entry] = {
    val hasPath = store.columns.contains("_metadata_path")
    val cols = Seq("chunk_id", "doc_id", "chunk_text", "embedding") ++
      (if (hasPath) Seq("_metadata_path") else Nil)
    val entries = store.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map { r =>
        Entry(r.getLong(0), r.getLong(1), r.getString(2),
          r.getSeq[Float](3).toArray,
          if (hasPath) r.getString(4) else null)
      }
    // fail fast on a serve(dim) / store-dim mismatch: truncated-cosine
    // scoring would otherwise return silently garbage rankings
    entries.find(_.vec.length != dim).foreach { e =>
      throw new IllegalArgumentException(
        s"store embedding dim ${e.vec.length} != serve dim $dim (chunk ${e.chunkId})")
    }
    entries
  }

  def serve(store: DataFrame, dim: Int, port: Int = 0,
      path: String = "/v2/answer", defaultK: Int = 3,
      chat: Option[Llms.ChatModel] = None,
      noAnswer: String = Rag.DefaultNoAnswer,
      sharded: Option[Boolean] = None,
      autoShardCells: Long = DefaultAutoShardCells): HttpServer =
    serveRefreshable(store, dim, port, path, defaultK, chat, noAnswer,
      sharded, autoShardCells).server

  /** Routes (servers.py:146-244 surface):
    *   - `<path>` (default `/v2/answer`): retrieval — body
    *     `{"query":…, "k":…}` → ranked chunks (see object scaladoc).
    *   - `/v2/answer_adaptive` (requires `chat`): the
    *     AdaptiveRAGQuestionAnswerer geometric loop SERVING-SIDE — body
    *     `{"query":…, "n_starting":2, "factor":2, "max_iterations":4}`;
    *     retrieves the max budget from the snapshot once, asks the chat
    *     with a geometrically growing context prefix until it answers →
    *     `{"response":…, "answered":…, "n_docs_used":…, "iterations":…}`.
    *   - `/v2/list_documents`: indexed-document inventory from the
    *     snapshot → `{"results":[{"doc_id":…, "n_chunks":…, "n_chars":…}]}`.
    *   - `/v2/summarize` (requires `chat`): body `{"text_list":[…]}` →
    *     `{"summary":…}` via [[Rag.summarizePrompt]].
    * Routes needing an absent `chat` answer 501.
    *
    * `sharded = None` (default) AUTO-selects per store: snapshot below
    * [[DefaultAutoShardCells]] embedding cells, sharded above — both paths
    * answer byte-identically (HttpSpec pins it), so the choice is purely a
    * memory/latency trade the endpoint makes for the operator. Pass
    * `Some(true/false)` to override. */
  def serveRefreshable(store: DataFrame, dim: Int, port: Int = 0,
      path: String = "/v2/answer", defaultK: Int = 3,
      chat: Option[Llms.ChatModel] = None,
      noAnswer: String = Rag.DefaultNoAnswer,
      sharded: Option[Boolean] = None,
      autoShardCells: Long = DefaultAutoShardCells): Served = {
    def mkIndex(st: DataFrame): Index =
      if (pickSharded(st, dim, sharded, autoShardCells)) new ShardedIndex(st, dim)
      else new SnapshotIndex(collectEntries(st, dim), st)
    val indexRef = new java.util.concurrent.atomic.AtomicReference[Index](mkIndex(store))
    val embedder = new Embedders.FakeEmbedder(dim)

    def jsonEscape(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext(path, new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          if (ex.getRequestMethod != "POST") {
            ex.sendResponseHeaders(405, -1); return
          }
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          import org.json4s._
          import org.json4s.jackson.JsonMethods
          val parsed =
            try JsonMethods.parse(body)
            catch { case scala.util.control.NonFatal(_) =>
              ex.sendResponseHeaders(400, -1); return }
          val query = parsed \ "query" match {
            case JString(q) => q
            case _ => null
          }
          if (query == null) { ex.sendResponseHeaders(400, -1); return }
          val k = parsed \ "k" match {
            case JInt(n) => n.toInt
            case _ => defaultK
          }
          // per-query retrieval filters (RetrieveQuerySchema metadata_filter /
          // filepath_globpattern), merged exactly like DocumentStore retrieval
          def strField(name: String): Option[String] = parsed \ name match {
            case JString(v) if v.nonEmpty => Some(v)
            case _ => None
          }
          val filter = graft.functions.IndexFilter.mergeFilters(
            strField("metadata_filter"), strField("filepath_globpattern")).orNull
          val qv = embedder.embedBatch(Seq(query)).head
          // non-finite scores (zero-norm query or chunk) can't rank and
          // -Infinity isn't valid JSON - the index drops them
          val top = indexRef.get().top(qv, k, filter)
          val results = top.map { case (e, s) =>
            s"""{"chunk_id":${e.chunkId},"doc_id":${e.docId},"score":$s,"text":"${jsonEscape(e.text)}"}"""
          }.mkString("[", ",", "]")
          val resp = s"""{"results":$results}""".getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, resp.length.toLong)
          ex.getResponseBody.write(resp)
        } finally ex.close()
      }
    })
    // ranked top-k over the current snapshot — shared by the retrieval
    // route above and the adaptive loop below
    def topChunks(query: String, k: Int): Array[(Entry, Double)] = {
      val qv = embedder.embedBatch(Seq(query)).head
      indexRef.get().top(qv, k)
    }

    def respond(ex: HttpExchange, code: Int, json: String): Unit = {
      val bytes = json.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
    }

    import org.json4s._
    import org.json4s.jackson.JsonMethods

    def parseBody(ex: HttpExchange): Option[JValue] = {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      try Some(JsonMethods.parse(body))
      catch { case scala.util.control.NonFatal(_) => None }
    }

    server.createContext("/v2/list_documents", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        val docs = indexRef.get().docSummary.map { case (docId, nChunks, nChars) =>
          s"""{"doc_id":$docId,"n_chunks":$nChunks,"n_chars":$nChars}"""
        }
        respond(ex, 200, docs.mkString("""{"results":[""", ",", "]}"))
      } finally ex.close()
    })

    // vector_store.py statistics_query: {file_count, last_modified}
    server.createContext("/v1/statistics", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        val inv = indexRef.get().fileInventory
        val lastMod = inv.flatMap(_._2).maxOption
          .map(us => (us / 1000000L).toString).getOrElse("null")
        respond(ex, 200,
          s"""{"file_count":${inv.size},"last_modified":$lastMod}""")
      } finally ex.close()
    })

    // vector_store.py inputs_query: body {"metadata_filter":…,
    // "filepath_globpattern":…} → the matching input files. Filters merge
    // and evaluate exactly like retrieval filters (IndexFilter.mergeFilters).
    server.createContext("/v1/inputs", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        val (mf, glob) = parseBody(ex) match {
          case Some(j) =>
            (j \ "metadata_filter" match { case JString(v) => Some(v); case _ => None },
             j \ "filepath_globpattern" match { case JString(v) => Some(v); case _ => None })
          case None => (None, None)
        }
        val filter = graft.functions.IndexFilter.mergeFilters(mf, glob).orNull
        val results = indexRef.get().fileInventory
          .filter { case (path, mod) =>
            // metadata visible to the filter mirrors the reference's file
            // metadata: path + modified_at (seconds)
            val md = Map("path" -> path) ++
              mod.map(us => "modified_at" -> (us / 1000000L).toString)
            graft.functions.IndexFilter.matches(filter, md) }
          .map { case (path, mod) =>
            s"""{"path":"${jsonEscape(path)}","modified_at":${
              mod.map(us => (us / 1000000L).toString).getOrElse("null")}}"""
          }
        respond(ex, 200, results.mkString("""{"results":[""", ",", "]}"))
      } finally ex.close()
    })

    server.createContext("/v2/summarize", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        if (ex.getRequestMethod != "POST") { ex.sendResponseHeaders(405, -1); return }
        chat match {
          case None => ex.sendResponseHeaders(501, -1)
          case Some(model) =>
            parseBody(ex).map(_ \ "text_list") match {
              case Some(JArray(items)) if items.forall(_.isInstanceOf[JString]) =>
                val texts = items.collect { case JString(s) => s }
                val prompt = Rag.summarizePrompt(texts)
                val out = model.completeBatch(Seq(Seq(
                  Llms.ChatMessage("user", prompt)))).head
                respond(ex, 200, s"""{"summary":"${jsonEscape(out)}"}""")
              case _ => ex.sendResponseHeaders(400, -1)
            }
        }
      } finally ex.close()
    })

    server.createContext("/v2/answer_adaptive", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        if (ex.getRequestMethod != "POST") { ex.sendResponseHeaders(405, -1); return }
        chat match {
          case None => ex.sendResponseHeaders(501, -1)
          case Some(model) =>
            val parsed = parseBody(ex).getOrElse { ex.sendResponseHeaders(400, -1); return }
            val query = parsed \ "query" match {
              case JString(q) => q
              case _ => ex.sendResponseHeaders(400, -1); return
            }
            def intOr(field: String, dflt: Int): Int = parsed \ field match {
              case JInt(n) => n.toInt
              case _ => dflt
            }
            val nStart = math.max(1, intOr("n_starting", 2))
            val factor = math.max(2, intOr("factor", 2))
            val maxIter = math.max(1, intOr("max_iterations", 4))
            // client-supplied budget: reject out-of-range instead of
            // letting pow/multiply wrap Int (a wrapped-negative kMax
            // would retrieve nothing and burn maxIter LLM calls)
            val kMax = graft.operators.Rag.saturatingBudget(nStart, factor, maxIter)
            if (maxIter > 32 || kMax > 100000) {
              respond(ex, 400,
                s"""{"error":"budget out of range: n_starting*factor^(max_iterations-1) must be <= 100000, max_iterations <= 32"}""")
              return
            }
            val ranked = topChunks(query, kMax).map(_._1.text)
            // the geometric loop (question_answering.py:184): grow the
            // context prefix until the model stops saying `noAnswer`
            var n = nStart; var iter = 0
            var answer: String = null
            while (answer == null && iter < maxIter) {
              iter += 1
              val ctx = ranked.take(n).mkString("\n\n")
              val prompt = "Answer the question based only on the context. " +
                s"""If the context does not contain the answer, reply exactly "$noAnswer".""" +
                s"\nContext:\n$ctx\n\nQuestion: $query\nAnswer:"
              val out = model.completeBatch(Seq(Seq(
                Llms.ChatMessage("user", prompt)))).head
              if (out != noAnswer) answer = out else n *= factor
            }
            val used = math.min(if (answer == null) n / factor else n, ranked.length)
            val answered = answer != null
            val resp = s"""{"response":"${jsonEscape(if (answered) answer else noAnswer)}",""" +
              s""""answered":$answered,"n_docs_used":$used,"iterations":$iter}"""
            respond(ex, 200, resp)
        }
      } finally ex.close()
    })

    server.start()
    new Served(server, indexRef, mkIndex)
  }
}
