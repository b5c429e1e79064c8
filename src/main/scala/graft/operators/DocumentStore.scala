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
}
