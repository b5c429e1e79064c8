package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document store: the xpack's flagship RAG composition (reference
  * python/pathway/xpacks/llm/document_store.py + vector_store.py — chunk →
  * embed → index → retrieve, optionally rerank), built purely from the
  * library's own operators so the whole path inherits their scale posture:
  * chunking is a posexplode, embedding is partition-batched, retrieval is a
  * broadcast-queries KNN (or SRP-LSH for corpus-scale query sets), reranking
  * a per-query window over the small candidate set.
  *
  * The embedder is the pluggable piece — `Embedders.embed` here (deterministic
  * stub; a real endpoint swaps in via the same partition-batched client,
  * see AsyncTransformer for the failure-tracking variant).
  */
object DocumentStore {

  /** The built index: one row per chunk with its embedding.
    * Columns: doc_id, chunk_id, chunk_idx, chunk_text, embedding
    * [+ metaCols]. `metaCols` carries document-level metadata (source,
    * path, timestamps…) onto every chunk so retrieval can pre-filter — the
    * reference's metadata JSON on each indexed row
    * (document_store.py `metadata_filter` / `filepath_globpattern`). */
  /** Unify heterogeneous input tables into one corpus (r17 decode of
    * test_document_store.py test_docstore_on_tables_with_different_schemas /
    * test_docstore_on_table_without_metadata): DocumentStore accepts a LIST
    * of tables; columns missing from one table (e.g. `_metadata_path`, or
    * extra per-source columns) null-fill — `unionByName(allowMissing)`. */
  def unifyInputs(tables: Seq[DataFrame]): DataFrame = {
    require(tables.nonEmpty, "DocumentStore needs at least one input table")
    tables.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Doc post-processors (document_store.py `doc_post_processors`; r17
    * decode of test_docstore_post_processor / metadata variant): each hook
    * rewrites (text, metadata) BEFORE chunking/indexing — applied in order,
    * as one codegen'd-boundary UDF pass over the corpus. Metadata rides as
    * a JSON string column (absent metadata = `{}`). */
  def applyPostProcessors(docs: DataFrame, textCol: Column, metadataCol: Column,
      processors: Seq[(String, String) => (String, String)]): DataFrame = {
    val chain = udf((text: String, meta: String) => {
      val start = (if (text == null) "" else text, if (meta == null) "{}" else meta)
      val (t, m) = processors.foldLeft(start) { case ((tt, mm), f) => f(tt, mm) }
      Seq(t, m)
    })
    docs.withColumn("_pp", chain(textCol, metadataCol))
      .withColumn("text", col("_pp").getItem(0))
      .withColumn("_metadata", col("_pp").getItem(1))
      .drop("_pp")
  }

  def build(docs: DataFrame, idCol: Column, textCol: Column,
      chunkTokens: Int = 50, overlap: Int = 10, dim: Int = 64,
      metaCols: Seq[Column] = Nil): DataFrame = {
    val chunks = TextOps.splitIntoChunks(
        docs.select(idCol.as("doc_id") +: textCol.as("text") +: metaCols: _*),
        col("text"), chunkTokens, overlap)
      .drop("text", "n_chunk_tokens")
      // chunk id from the CrossHash md5 family (not xxhash64 pointers): the
      // id doubles as the retrieval tie-break, and md5 keeps the whole store
      // — ids included — reproducible by any engine (the DuckDB oracle
      // re-derives it)
      .withColumn("chunk_id", graft.functions.CrossHash.md5Long(
        concat_ws(":", col("doc_id"), col("chunk_idx"))))
    // A built index is by definition multi-consumer (every retrieve reads it
    // twice: KNN corpus + metadata join-back) — persist and materialize
    // eagerly so the chunk+embed pipeline runs exactly once, not once per
    // downstream subquery (AQE races recomputation otherwise, SURVEY §8).
    // Callers drop it with unpersist(); on a cluster this would be a
    // checkpoint/Delta table — same posture.
    val store = Embedders.embed(chunks, "chunk_text", dim = dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    store.count()
    store
  }

  /** Top-k chunks per query by cosine over the store's embeddings.
    * `exact = false` routes through SRP-LSH buckets instead of the
    * broadcast-queries brute force (the corpus-scale path).
    *
    * `metadataFilter` is the reference's `metadata_filter` /
    * `filepath_globpattern` (document_store.py:35) re-expressed as a Column
    * predicate over the store's metadata columns — applied BEFORE candidate
    * generation, so the KNN scans only the eligible subset (pre-filtered
    * ANN: the filter prunes the scan instead of discarding ranked results,
    * and top-k stays exactly k among eligible chunks). */
  def retrieve(store: DataFrame, queries: DataFrame, qId: Column, qText: Column,
      k: Int = 5, dim: Int = 64, exact: Boolean = true,
      metadataFilter: Option[Column] = None): DataFrame = {
    val corpus = metadataFilter.fold(store)(store.filter)
    val q = Embedders.embed(queries.select(qId.as("query_id"), qText.as("q_text")),
      "q_text", dim = dim)
    val knn =
      if (exact) Similarity.bruteForceKnn(q, col("query_id"), col("embedding"),
        corpus, col("chunk_id"), col("embedding"), k)
      else Similarity.lshKnn(q, col("query_id"), col("embedding"),
        corpus, col("chunk_id"), col("embedding"), k, dim)
    knn.join(corpus.select(col("chunk_id").as("nn_id"), col("doc_id"),
        col("chunk_idx"), col("chunk_text")), "nn_id")
      .select(col("query_id"), col("nn_id").as("chunk_id"), col("doc_id"),
        col("chunk_idx"), col("chunk_text"), col("score"), col("rank"))
  }

  /** One merged hit from the sharded serving path. */
  final case class ShardHit(queryId: Long, chunkId: Long, docId: Long,
      chunkText: String, score: Double, rank: Int)

  /** Per-doc inventory (docId, nChunks, nChars) over in-memory (docId,
    * chunkText) pairs — nChars in CODE POINTS (parity with the distributed
    * form's SQL length() and the reference's Python len()). One shared
    * implementation for the QA/MCP servers' list_documents surfaces. */
  private[graft] def docSummary(chunks: Iterator[(Long, String)]): Seq[(Long, Long, Long)] =
    chunks.toSeq.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, cs) =>
      (d, cs.length.toLong,
        cs.map(t => t._2.codePointCount(0, t._2.length).toLong).sum)
    }

  /** Distributed twin of [[docSummary]] over a store DataFrame — one small
    * aggregation, ships one row per document. */
  private[graft] def docSummaryDistributed(store: DataFrame): Seq[(Long, Long, Long)] =
    store.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum(length(col("chunk_text"))).as("c"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  /** Serving-side cosine — shared by the snapshot path (QaServer) and the
    * sharded path so their scores are bit-identical (same operation order,
    * Float products widened the same way). */
  private[graft] def cosineF(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) Double.NegativeInfinity
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Sharded serving retrieval (reference document_store.py:35 retrieval
    * contract at corpus scale): per-partition top-k over the EXECUTOR-HELD
    * persisted store, merged at the driver. The collected snapshot
    * (QaServer's default, mirroring the reference's own in-server
    * usearch/tantivy index) is right while the corpus fits in server
    * memory; past that, this path keeps the store distributed and ships
    * only ≤ numPartitions·k candidate rows per query — the store itself
    * never crosses the wire.
    *
    * Ordering is the snapshot path's exact total order ((-score, chunkId),
    * non-finite scores dropped) and scoring shares [[cosineF]], so per-shard
    * top-k is a superset of each shard's contribution to the global top-k
    * and the merged result is bit-for-bit the snapshot answer
    * (DocumentStoreSpec pins the equivalence). */
  def retrieveSharded(store: DataFrame, queryVecs: Seq[(Long, Array[Float])],
      k: Int, expectDim: Option[Int] = None): Array[ShardHit] = {
    if (queryVecs.isEmpty || k <= 0) return Array.empty
    val sp = store.sparkSession
    import sp.implicits._
    val qArr = queryVecs.toArray // small serving batch — rides the closure
    val kk = k
    val dimCheck = expectDim.getOrElse(-1)
    val perShard = store.select("chunk_id", "doc_id", "chunk_text", "embedding")
      .as[(Long, Long, String, Array[Float])]
      .mapPartitions { rows =>
        // one bounded worst-at-head heap per query; head = current worst
        // kept hit under the (-score, chunkId) total order
        val heaps = Array.fill(qArr.length)(
          new scala.collection.mutable.PriorityQueue[(Double, Long, Long, String)]()(
            Ordering.by { t: (Double, Long, Long, String) => (-t._1, t._2) }))
        rows.foreach { case (chunkId, docId, text, vec) =>
          // fail fast on a store/serve dim mismatch DURING the scan we run
          // anyway (truncated-cosine scoring would silently mis-rank) —
          // no dedicated validation pass over the corpus-scale store
          if (dimCheck >= 0 && vec.length != dimCheck)
            throw new IllegalArgumentException(
              s"store embedding dim ${vec.length} != serve dim $dimCheck (chunk $chunkId)")
          var qi = 0
          while (qi < qArr.length) {
            val s = cosineF(qArr(qi)._2, vec)
            if (java.lang.Double.isFinite(s)) {
              val h = heaps(qi)
              if (h.size < kk) h.enqueue((s, chunkId, docId, text))
              else {
                val (ws, wid, _, _) = h.head
                if (s > ws || (s == ws && chunkId < wid)) {
                  h.dequeue(); h.enqueue((s, chunkId, docId, text))
                }
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (s, cid, did, txt) => (qArr(qi)._1, cid, did, txt, s) }
        }
      }
      .collect()
    perShard.groupBy(_._1).toArray.flatMap { case (qid, hits) =>
      hits.sortBy { case (_, cid, _, _, s) => (-s, cid) }
        .take(k).iterator.zipWithIndex.map { case ((_, cid, did, txt, s), i) =>
          ShardHit(qid, cid, did, txt, s, i + 1)
        }
    }
  }

  /** Retrieve a wider candidate set, then rerank with the lexical scorer
    * (second stage; an LLM scorer swaps in through rerankTopK's `scorer`). */
  def retrieveReranked(store: DataFrame, queries: DataFrame, qId: Column,
      qText: Column, fetchK: Int = 20, finalK: Int = 5, dim: Int = 64): DataFrame = {
    val fetched = retrieve(store, queries, qId, qText, fetchK, dim)
      .join(queries.select(qId.as("query_id"), qText.as("q_text")), "query_id")
    val reranked = TextOps.rerankTopK(fetched, col("query_id"), col("q_text"),
        col("chunk_id"), col("chunk_text"), finalK)
      .select(col("q_id").as("query_id"), col("doc_id").as("chunk_id"),
        col("score").as("rerank_score"), col("rank"))
    reranked.join(fetched.select("query_id", "chunk_id", "doc_id", "chunk_idx",
        "chunk_text"), Seq("query_id", "chunk_id"))
      .select("query_id", "doc_id", "chunk_idx", "chunk_text", "rerank_score", "rank")
  }

  /** Hybrid retrieval (reference `HybridIndexFactory` — a DocumentStore
    * built over SEVERAL retrievers whose per-query rankings fuse by
    * reciprocal rank; xpacks/llm/tests/test_document_store.py:264/338,
    * stdlib/indexing/hybrid_index.py): a vector arm (cosine KNN over the
    * store embeddings) and a lexical arm (BM25 over the chunk text for the
    * query's own terms), each ranked top-k per query, fused with
    * [[Similarity.rrfFusion]]. The metadata/glob filter pre-filters the
    * corpus ONCE, before BOTH arms — the reference applies the query's
    * filter inside every retriever of the hybrid, so a non-matching glob
    * yields zero rows from either arm (test:338).
    *
    * Scale shape: the vector arm is the broadcast-queries KNN; the lexical
    * arm is one exploded-token groupBy over the eligible corpus joined to a
    * broadcast query-term table; fusion is a (query, chunk)-keyed agg. */
  def retrieveHybrid(store: DataFrame, queries: DataFrame, qId: Column,
      qText: Column, k: Int = 5, dim: Int = 64, k0: Int = 60,
      metadataFilter: Option[Column] = None): DataFrame = {
    val corpus = metadataFilter.fold(store)(store.filter)
    val q = queries.select(qId.as("query_id"), qText.as("q_text"))
    // vector arm: same exact-KNN path as retrieve()
    val qEmb = Embedders.embed(q, "q_text", dim = dim)
    val vecArm = Similarity.bruteForceKnn(qEmb, col("query_id"), col("embedding"),
      corpus, col("chunk_id"), col("embedding"), k)
      .select(col("query_id"), col("nn_id"), col("rank"))
    // lexical arm: BM25 of each query's own terms over the eligible chunks.
    // The (query_id, term) pairs are COLLECTED once and rebuilt as a literal
    // frame (bounded by the query vocabulary — the small side throughout
    // this file): the lazy fused plan must not re-derive the terms from the
    // source at execution time, where a nondeterministic `queries` input
    // could diverge from the `terms` list the per-term table was built on
    // (r18 review; this also ends the old persist/unpersist-before-execute
    // lifecycle bug)
    val qTermsSrc = q.select(col("query_id"),
        explode(array_distinct(TextOps.wordTokens(col("q_text")))).as("term"))
    val spark = store.sparkSession
    val pairs = qTermsSrc.collect().toSeq
    val qTerms = spark.createDataFrame(
      spark.sparkContext.parallelize(pairs, 1), qTermsSrc.schema)
    val terms = pairs.map(_.getString(1)).distinct
    val lexArm =
      if (terms.isEmpty) vecArm.limit(0)
      else {
        // per-term scores and the per-chunk sum both round to 6 dp: BM25's
        // LN/div chain contracts differently (FMA) across engines, and the
        // sum order of a chunk's 2-3 term scores is partition-dependent —
        // 6 dp is far above ULP noise and far below score resolution, the
        // same pin the green bm25_per_term oracle row carries
        val perTerm = TextOps.bm25PerTerm(corpus, col("chunk_id"),
            col("chunk_text"), terms, tokenize = TextOps.wordTokens)
          .withColumn("score", round(col("score"), 6))
        val scored = perTerm.join(broadcast(qTerms), "term")
          .groupBy(col("query_id"), col("id").as("nn_id"))
          .agg(round(sum("score"), 6).as("score"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("score").desc, col("nn_id"))
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("nn_id"), col("rank"))
      }
    val fused = Similarity.rrfFusion(Seq(vecArm, lexArm), k0, k)
    fused.join(corpus.select(col("chunk_id").as("nn_id"), col("doc_id"),
        col("chunk_idx"), col("chunk_text")), "nn_id")
      .select(col("query_id"), col("nn_id").as("chunk_id"), col("doc_id"),
        col("chunk_idx"), col("chunk_text"), col("rrf_score"), col("rank"))
  }
}
