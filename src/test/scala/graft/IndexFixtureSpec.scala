package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Replays of the reference's index fixtures (tests/ml/test_index.py, r16
  * decode) on [[Similarity.knnQuery]]: L2² metric, per-query k (k=0 → empty),
  * metadata filtering before top-k, and the update-old vs as-of-now split
  * (as-of-now queries see only points that arrived strictly earlier). Tie
  * rows (equal distance) are asserted as SETS — the reference's tie order is
  * engine-internal; ours is the smaller id. */
class IndexFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // get_points(): 6 index points / 4 queries, with the ORIGINAL enumeration
  // index as metadata foo (the filter fixture counts queries too)
  private val pointRows = Seq( // (id=foo, x, y, arrivalTime)
    (0, 2.0, 2.0, 2L), (1, 3.0, -2.0, 4L), (3, -1.0, 0.0, 8L),
    (5, 1.0, 2.0, 12L), (7, -3.0, 1.0, 16L), (9, 1.0, -4.0, 20L))
  private val queryRows = Seq( // (qid, x, y, queryTime, k)
    (2, 0.0, 0.0, 6L, 1), (4, 2.0, -2.0, 10L, 2),
    (6, -1.0, 1.0, 14L, 3), (8, -2.0, -3.0, 18L, 0))

  private def points: DataFrame =
    pointRows.toDF("id", "x", "y", "t")
      .select(col("id"), array(col("x"), col("y")).as("vec"), col("t"))
  private def queries: DataFrame =
    queryRows.toDF("qid", "x", "y", "qt", "k")
      .select(col("qid"), array(col("x"), col("y")).as("qvec"), col("qt"), col("k"))

  /** per-query result as id → sorted coord pairs of the neighbors */
  private def nnCoords(res: DataFrame): Map[Int, Seq[(Double, Double)]] = {
    val coordsOf = pointRows.map(p => p._1 -> ((p._2, p._3))).toMap
    val grouped = res.collect()
      .map(r => (r.getInt(0), coordsOf(r.getInt(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    queryRows.map(q => q._1 -> grouped.getOrElse(q._1, Seq.empty)).toMap
  }

  test("test_all_at_once: L2² top-2 over the full point set") {
    val res = Similarity.knnQuery(queries, col("qid"), col("qvec"), lit(2),
      points, col("id"), col("vec"))
    assert(nnCoords(res) == Map(
      2 -> Seq((-1.0, 0.0), (1.0, 2.0)),
      4 -> Seq((1.0, -4.0), (3.0, -2.0)),
      6 -> Seq((-3.0, 1.0), (-1.0, 0.0)),
      8 -> Seq((-1.0, 0.0), (1.0, -4.0))))
  }

  test("test_all_at_once_metadata_filter: candidates filtered BEFORE top-k (foo > 4)") {
    val res = Similarity.knnQuery(queries, col("qid"), col("qvec"), lit(2),
      points, col("id"), col("vec"), corpusFilter = Some(col("id") > 4))
    assert(nnCoords(res) == Map(
      2 -> Seq((-3.0, 1.0), (1.0, 2.0)),
      4 -> Seq((1.0, -4.0), (1.0, 2.0)),
      6 -> Seq((-3.0, 1.0), (1.0, 2.0)),
      8 -> Seq((-3.0, 1.0), (1.0, -4.0))))
  }

  test("test_update_old_with_variable_k: per-query k incl. k=0 → empty") {
    val res = Similarity.knnQuery(queries, col("qid"), col("qvec"), col("k"),
      points, col("id"), col("vec"))
    assert(nnCoords(res) == Map(
      2 -> Seq((-1.0, 0.0)),
      4 -> Seq((1.0, -4.0), (3.0, -2.0)),
      6 -> Seq((-3.0, 1.0), (-1.0, 0.0), (1.0, 2.0)),
      8 -> Seq.empty))
  }

  test("test_asof_now: each query sees only points that arrived before it") {
    val res = Similarity.knnQuery(queries, col("qid"), col("qvec"), lit(2),
      points, col("id"), col("vec"), asofNow = Some((col("qt"), col("t"))))
    assert(nnCoords(res) == Map(
      2 -> Seq((2.0, 2.0), (3.0, -2.0)),
      4 -> Seq((-1.0, 0.0), (3.0, -2.0)),
      6 -> Seq((-1.0, 0.0), (1.0, 2.0)),
      8 -> Seq((-3.0, 1.0), (-1.0, 0.0))))
  }

  test("test_asof_now_with_variable_k: both axes compose") {
    val res = Similarity.knnQuery(queries, col("qid"), col("qvec"), col("k"),
      points, col("id"), col("vec"), asofNow = Some((col("qt"), col("t"))))
    assert(nnCoords(res) == Map(
      2 -> Seq((2.0, 2.0)),
      4 -> Seq((-1.0, 0.0), (3.0, -2.0)),
      6 -> Seq((-1.0, 0.0), (1.0, 2.0), (2.0, 2.0)),
      8 -> Seq.empty))
  }

  test("test_get_distances: distances are SQUARED L2; ties resolve deterministically") {
    val res = Similarity.knnQuery(queries, col("qid"), col("qvec"), lit(2),
      points, col("id"), col("vec"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    val byQ = res.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(byQ == Map(2 -> Seq(1.0, 5.0), 4 -> Seq(1.0, 5.0),
      6 -> Seq(1.0, 4.0), 8 -> Seq(10.0, 10.0)))
    // the (−2,−3) query is a genuine tie: {(−1,0), (1,−4)} both at 10
    val tied = res.filter(_._1 == 8).map(_._2).toSet
    assert(tied == Set(3, 9))
  }

  test("test_hybrid_index: RRF with constant k fuses sub-index ranks; duplicates merge by sum") {
    // index1 (embedder1 cosine): doc1 rank 1, doc2 rank 2;
    // index2 (embedder2 cosine): doc2 rank 1, doc3 rank 2; hybrid k = 2
    val r1 = Seq((1L, 1L, 1L), (1L, 2L, 2L)).toDF("query_id", "nn_id", "rank")
    val r2 = Seq((1L, 2L, 1L), (1L, 3L, 2L)).toDF("query_id", "nn_id", "rank")
    val fused = Similarity.rrfFusion(Seq(r1, r2), k0 = 2, topK = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(fused == Seq((2L, 1.0 / 3 + 1.0 / 4), (1L, 1.0 / 3)))
    // test_hybrid_index_ignores_duplicates: both sub-indexes return the same
    // docs; the duplicate merges (scores sum), it is not listed twice
    val dup = Similarity.rrfFusion(Seq(r1, r1), k0 = 2, topK = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(dup == Seq((1L, 2.0 / 3), (2L, 2.0 / 4)))
  }

  test("test_full_text_search: BM25 retrieval order and membership (tantivy-style tokens)") {
    val docs = Seq(
      (1, "Lorem ipsum dolor sit amet, consectetur adipiscing elit."),
      (2, "Cras ex lorem, luctus nec dui eu, pellentesque vestibulum velit."),
      (3, "Nunc laoreet tortor quis odio mattis vulputate."),
      (4, "Quisque vel dictum neque, at efficitur nisi."),
      (5, "Aliquam dui nibh, cursus ac porttitor nec, placerat quis nisi."),
      (6, "Curabitur vehicula enim vitae rhoncus feugiat.")).toDF("info", "text")
    val queries = Seq("nisi", "elit", "lorem", "marchewka")
    val scored = graft.operators.TextOps.bm25PerTerm(docs, col("info"), col("text"),
      queries, tokenize = graft.operators.TextOps.wordTokens)
    val byTerm = scored.collect()
      .map(r => (r.getString(1), r.getInt(0), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(x => (-x._3, x._2)).map(_._2).take(4).toSeq).toMap
    assert(byTerm.getOrElse("elit", Seq.empty) == Seq(1))
    assert(byTerm.getOrElse("lorem", Seq.empty) == Seq(1, 2))
    assert(byTerm.getOrElse("marchewka", Seq.empty) == Seq.empty)
    assert(byTerm.getOrElse("nisi", Seq.empty) == Seq(4, 5))
  }
}
