package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DocumentStore

/** End-to-end RAG composition: chunk → embed → retrieve → rerank. */
class DocumentStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon " * 12),
    (2L, "spark shuffle partition broadcast join " * 12),
    (3L, "minhash shingle jaccard signature band " * 12)).toDF("id", "body")

  test("build produces one embedded row per chunk with stable chunk ids") {
    val store = DocumentStore.build(docs, col("id"), col("body"),
      chunkTokens = 20, overlap = 5, dim = 16).cache()
    assert(store.columns.toSet ==
      Set("doc_id", "chunk_idx", "chunk_text", "chunk_id", "embedding"))
    val perDoc = store.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(perDoc.values.forall(_ >= 3)) // 60 tokens, 15-token stride
    assert(store.select("chunk_id").distinct.count() == store.count())
  }

  test("retrieve finds the source document's chunks for its own vocabulary") {
    val store = DocumentStore.build(docs, col("id"), col("body"),
      chunkTokens = 20, overlap = 5, dim = 16).cache()
    val queries = Seq((100L, "spark shuffle partition"),
      (200L, "minhash shingle jaccard")).toDF("qid", "qtext")
    val hits = DocumentStore.retrieve(store, queries, col("qid"), col("qtext"),
      k = 3, dim = 16)
    val topDoc = hits.filter(col("rank") === 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toMap
    assert(topDoc(100L) == 2L && topDoc(200L) == 3L)
  }

  test("metadata-filtered retrieve scans only eligible chunks, keeps top-k exact") {
    val docsMeta = Seq(
      (1L, "alpha beta gamma delta epsilon " * 12, "wiki", "/a/1.md"),
      (2L, "spark shuffle partition broadcast join " * 12, "web", "/b/2.md"),
      (3L, "spark shuffle partition broadcast join " * 12, "wiki", "/a/3.md"))
      .toDF("id", "body", "source", "path")
    val store = DocumentStore.build(docsMeta, col("id"), col("body"),
      chunkTokens = 20, overlap = 5, dim = 16,
      metaCols = Seq(col("source"), col("path"))).cache()
    assert(store.columns.contains("source") && store.columns.contains("path"))
    val queries = Seq((100L, "spark shuffle partition")).toDF("qid", "qtext")
    // doc 2 is the best match but lives in 'web' — the wiki filter must
    // surface doc 3's identical chunks instead, still exactly k of them
    val hits = DocumentStore.retrieve(store, queries, col("qid"), col("qtext"),
      k = 3, dim = 16, metadataFilter = Some(col("source") === "wiki"))
    val got = hits.select("doc_id").as[Long].collect()
    assert(got.length == 3 && got.forall(_ == 3L))
    // glob-style path filter (filepath_globpattern analog)
    val byPath = DocumentStore.retrieve(store, queries, col("qid"), col("qtext"),
      k = 3, dim = 16, metadataFilter = Some(col("path").like("/a/%")))
    assert(byPath.select("doc_id").as[Long].collect().forall(Set(1L, 3L)))
  }

  test("retrieveSharded ≡ snapshot top-k bit-for-bit (ids, scores, order)") {
    val store = DocumentStore.build(docs, col("id"), col("body"),
      chunkTokens = 20, overlap = 5, dim = 16)
    // many small shards so per-partition top-k + driver merge is exercised
    val shardedStore = store.repartition(7)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    shardedStore.count()
    val embedder = new graft.operators.Embedders.FakeEmbedder(16)
    val qVecs = Seq(
      10L -> "spark shuffle partition", 20L -> "minhash shingle jaccard",
      30L -> "" /* zero vector: every score non-finite, dropped */)
      .map { case (id, t) => id -> embedder.embedBatch(Seq(t)).head }
    val hits = DocumentStore.retrieveSharded(shardedStore, qVecs, k = 4)
      .groupBy(_.queryId)
    // driver-side reference = exactly the snapshot path's ranking
    val entries = store.select("chunk_id", "doc_id", "chunk_text", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getSeq[Float](3).toArray))
    for ((qid, qv) <- qVecs) {
      val want = entries
        .map { case (cid, did, txt, v) => (cid, did, txt, DocumentStore.cosineF(qv, v)) }
        .filter(t => java.lang.Double.isFinite(t._4))
        .sortBy(t => (-t._4, t._1)).take(4)
      val got = hits.getOrElse(qid, Array.empty).sortBy(_.rank)
      assert(got.length == want.length, s"q$qid count")
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g.rank == i + 1)
        assert(g.chunkId == w._1 && g.docId == w._2 && g.chunkText == w._3)
        assert(g.score == w._4, s"q$qid rank ${i + 1}: exact score") // bit-for-bit
      }
    }
    assert(!hits.contains(30L)) // zero-norm query retrieves nothing, cleanly
    shardedStore.unpersist(); store.unpersist()
  }

  test("retrieveReranked returns finalK chunks ranked by lexical overlap") {
    val store = DocumentStore.build(docs, col("id"), col("body"),
      chunkTokens = 20, overlap = 5, dim = 16).cache()
    val queries = Seq((100L, "alpha beta gamma")).toDF("qid", "qtext")
    val out = DocumentStore.retrieveReranked(store, queries, col("qid"), col("qtext"),
      fetchK = 6, finalK = 2, dim = 16).cache()
    assert(out.count() == 2)
    val top = out.filter(col("rank") === 1).select("doc_id").as[Long].head()
    assert(top == 1L)
    assert(out.select("rerank_score").as[Double].collect().forall(_ > 0.9))
  }

  test("tables with different schemas unify into one corpus; missing columns " +
      "null-fill (test_document_store.py r17 decode)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs1 = Seq((1L, "test")).toDF("doc_id", "text")
    val docs2 = Seq((2L, "test2", "{}", 1)).toDF("doc_id", "text", "_metadata", "val")
    val corpus = graft.operators.DocumentStore.unifyInputs(Seq(docs1, docs2))
    assert(corpus.count() == 2)
    assert(corpus.columns.toSet == Set("doc_id", "text", "_metadata", "val"))
    // docs1's row carries nulls for the columns it lacks
    val r1 = corpus.filter(col("doc_id") === 1L).head
    assert(r1.isNullAt(r1.fieldIndex("_metadata")) && r1.isNullAt(r1.fieldIndex("val")))
    // and a store built over the union retrieves from BOTH sources
    val store = graft.operators.DocumentStore.build(
      corpus, col("doc_id"), col("text"), chunkTokens = 10, overlap = 2, dim = 16)
    assert(store.select("doc_id").distinct().count() == 2)
    store.unpersist()
  }

  test("doc post-processors rewrite text and metadata before indexing, " +
      "in order (test_docstore_post_processor r17 decode)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "test", """{"foo":"bar"}""")).toDF("doc_id", "text", "_metadata")
    val addBaz: (String, String) => (String, String) = (t, m) => (t + "baz", m)
    val addId: (String, String) => (String, String) =
      (t, m) => (t, m.stripSuffix("}") + ""","id":1}""")
    val out = graft.operators.DocumentStore.applyPostProcessors(
      docs, col("text"), col("_metadata"), Seq(addBaz, addId)).head
    assert(out.getString(out.fieldIndex("text")) == "testbaz")
    assert(out.getString(out.fieldIndex("_metadata")) == """{"foo":"bar","id":1}""")
  }

  test("retrieveHybrid: vector + BM25 arms fuse by reciprocal rank; the " +
      "metadata/glob filter pre-filters BOTH arms " +
      "(test_document_store.py:264/338 hybrid store)") {
    val docsMeta = Seq(
      (1L, "alpha beta gamma delta epsilon " * 12, "/a/1.md"),
      (2L, "spark shuffle partition broadcast join " * 12, "/b/2.md"),
      (3L, "spark shuffle partition broadcast join " * 12, "/a/3.md"))
      .toDF("id", "body", "path")
    val store = DocumentStore.build(docsMeta, col("id"), col("body"),
      chunkTokens = 20, overlap = 5, dim = 16,
      metaCols = Seq(col("path"))).cache()
    val queries = Seq((100L, "spark shuffle partition")).toDF("qid", "qtext")
    // positive: the best doc matches both lexically and by embedding — the
    // fused rank-1 hit is its chunk (test:264's dist < 1e-6 analog), and
    // every returned row carries real text
    val hits = DocumentStore.retrieveHybrid(store, queries, col("qid"),
      col("qtext"), k = 3, dim = 16)
    val top = hits.filter(col("rank") === 1)
      .select("doc_id", "chunk_text").as[(Long, String)].head()
    assert(Set(2L, 3L)(top._1) && top._2.nonEmpty)
    // both arms contributed: the rrf score of rank-1 reflects two lists
    val s1 = hits.filter(col("rank") === 1).select("rrf_score").as[Double].head()
    assert(s1 > 1.0 / 61 + 1e-9, s"rank-1 fused score $s1 should exceed a single-arm score")
    // filtered: only /a/ paths eligible — doc 2 (better unfiltered) must
    // never appear; doc 3's identical chunks win both arms
    val filtered = DocumentStore.retrieveHybrid(store, queries, col("qid"),
      col("qtext"), k = 3, dim = 16,
      metadataFilter = Some(col("path").like("/a/%")))
    val got = filtered.select("doc_id").as[Long].collect()
    assert(got.nonEmpty && got.forall(_ == 3L))
    // negative glob (test:338): nothing eligible -> zero rows from the hybrid
    val none = DocumentStore.retrieveHybrid(store, queries, col("qid"),
      col("qtext"), k = 3, dim = 16,
      metadataFilter = Some(col("path").like("/zzz/%")))
    assert(none.count() == 0)
    store.unpersist()
  }
}
