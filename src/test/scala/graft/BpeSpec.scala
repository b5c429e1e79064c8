package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE tokenizer: the Sennrich et al. worked example as a known-answer
  * fixture, driver/distributed trainer equivalence, encode round-trip. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // classic corpus: low×5 lower×2 newest×6 widest×3
  private def corpusDf = Seq(
    (1L, ("low " * 5).trim),
    (2L, ("lower " * 2).trim),
    (3L, ("newest " * 6).trim),
    (4L, ("widest " * 3).trim)).toDF("doc_id", "text")

  // hand-derived merge sequence (count desc, then lexicographic pair):
  // (e,s)=9 ties (s,t)=9 → (e,s); then (es,t)=9; (l,o)=7 ties (o,w)→(l,o);
  // (lo,w)=7; (e,w)=6 ties (n,e),(w,est) → (e,w)
  private val expected5 = Seq(
    Bpe.Merge("e", "s"), Bpe.Merge("es", "t"), Bpe.Merge("l", "o"),
    Bpe.Merge("lo", "w"), Bpe.Merge("e", "w"))

  test("trainLocal reproduces the Sennrich worked example") {
    val merges = Bpe.train(corpusDf, col("text"), nMerges = 5)
    assert(merges == expected5)
  }

  test("distributed trainer produces byte-identical merges") {
    val wc = Bpe.wordCounts(corpusDf.repartition(7), col("text"))
    val dist = Bpe.trainDistributed(wc, nMerges = 5, minPairCount = 2L)
    assert(dist == expected5)
  }

  test("distributed trainer matches local past the checkpoint cadence") {
    // >8 merges exercises the localCheckpoint lineage-truncation path
    val corpus = (corpusDf.collect().map(r => (r.getLong(0), r.getString(1))) ++
      Seq((5L, ("maker " * 4).trim), (6L, ("taken " * 3).trim)))
      .toSeq.toDF("doc_id", "text")
    val local = Bpe.train(corpus, col("text"), nMerges = 14)
    val dist = Bpe.trainDistributed(
      Bpe.wordCounts(corpus.repartition(5), col("text")), 14, 2L)
    assert(local.length > 8 && dist == local)
  }

  test("encode merges greedily by rank: lowest = 'low' + 'est'") {
    val merges = Bpe.train(corpusDf, col("text"), nMerges = 10)
    val df = Seq((7L, "lowest")).toDF("id", "t")
    val out = Bpe.encode(df, col("id"), col("t"), merges).collect()(0)
    assert(out.getSeq[String](1) == Seq("low", "est"))
    assert(out.getLong(2) == 2L)
    assert(out.getBoolean(3))
  }

  test("round-trip holds corpus-wide, partition-invariant, empty-safe") {
    val merges = Bpe.train(corpusDf, col("text"), nMerges = 8)
    val docs = Seq(
      (1L, "the lowest of the low in the newest west"),
      (2L, ""),
      (3L, "   "),
      (4L, "unseen vocabulary zigzag")).toDF("id", "t")
    for (parts <- Seq(1, 5)) {
      val rows = Bpe.encode(docs.repartition(parts), col("id"), col("t"), merges)
        .orderBy("id").collect()
      assert(rows.forall(_.getBoolean(3)), s"roundtrip failed at parts=$parts")
      assert(rows(1).getLong(2) == 0L && rows(2).getLong(2) == 0L)
      // unseen words fall back to characters joined by learned subwords only
      assert(rows(3).getSeq[String](1).mkString == "unseenvocabularyzigzag")
    }
  }

  test("encodeIds: vocab-stable ids, UNK=-1 for unseen chars") {
    val merges = Bpe.train(corpusDf, col("text"), nMerges = 10)
    val vocab = Bpe.vocabulary(merges, Bpe.baseSymbols(corpusDf, col("text")))
    // base chars get the low ids; merge outputs follow in rank order
    assert(vocab.indexOf("es") >= 0 && vocab.indexOf("est") > vocab.indexOf("es"))
    val out = Bpe.encodeIds(Seq((1L, "lowest"), (2L, "zig?"))
        .toDF("id", "t"), col("id"), col("t"), merges, vocab)
      .orderBy("id").collect()
    val ids1 = out(0).getSeq[Int](1)
    assert(ids1 == Seq(vocab.indexOf("low"), vocab.indexOf("est")))
    // '?' and 'z' never appeared in the corpus -> -1 sentinel
    assert(out(1).getSeq[Int](1).contains(-1))
  }

  test("batched distributed trainer matches local on randomized hazard corpora") {
    // planted hazards: self-overlap runs (aaaa), alternation (ababab) whose
    // merges create (ab,ab)-style pairs, and convergent derivations that
    // collide on fused names — exactly the cases the safe-prefix rule must
    // stop the batch for
    val rnd = new scala.util.Random(20260814)
    for (trial <- 0 until 6) {
      val alphabet = "abcde"
      val words = (0 until 40).map { _ =>
        val len = 1 + rnd.nextInt(8)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      } ++ Seq("aaaa", "ababab", "abab", "aab", "abc", "bcd")
      val docs = words.zipWithIndex.map { case (w, i) =>
        (i.toLong, ((w + " ") * (1 + rnd.nextInt(5))).trim)
      }.toDF("doc_id", "text")
      val local = Bpe.train(docs, col("text"), nMerges = 25)
      val dist = Bpe.trainDistributed(
        Bpe.wordCounts(docs.repartition(3), col("text")), 25, 2L)
      assert(dist == local, s"trial $trial diverged:\n dist=$dist\nlocal=$local")
    }
    // wider alphabet + more words: counts spread thin, the safe prefix
    // actually accepts multi-merge batches — pins the batched path itself,
    // not just its batch-of-1 degenerate case
    for (trial <- 0 until 2) {
      val alphabet = "abcdefghijklmnop"
      val words = (0 until 220).map { _ =>
        val len = 2 + rnd.nextInt(9)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val docs = words.zipWithIndex.map { case (w, i) =>
        (i.toLong, ((w + " ") * (1 + rnd.nextInt(4))).trim)
      }.toDF("doc_id", "text")
      val local = Bpe.train(docs, col("text"), nMerges = 40)
      val dist = Bpe.trainDistributed(
        Bpe.wordCounts(docs.repartition(4), col("text")), 40, 2L)
      assert(dist == local, s"wide trial $trial diverged:\n dist=$dist\nlocal=$local")
    }
  }

  test("incremental pair maintenance stays exact over a deep merge run") {
    // 1500 words / 150 merges / 19 checkpoint cycles: enough super-steps
    // that any drift in the delta bookkeeping (retract-old/assert-new,
    // full-outer merge, zero-count pruning) would diverge from the
    // from-scratch sequential trainer
    val rnd = new scala.util.Random(424242)
    val alphabet = "abcdefghij"
    val words = (0 until 1500).map { _ =>
      val len = 2 + rnd.nextInt(10)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val docs = words.zipWithIndex.map { case (w, i) =>
      (i.toLong, ((w + " ") * (1 + rnd.nextInt(3))).trim)
    }.toDF("doc_id", "text")
    val local = Bpe.train(docs, col("text"), nMerges = 150)
    val dist = Bpe.trainDistributed(
      Bpe.wordCounts(docs.repartition(6), col("text")), 150, 2L)
    assert(local.length == 150 && dist == local,
      s"diverged at ${dist.zip(local).indexWhere(p => p._1 != p._2)}")
  }

  test("batched trainer is exact even with a tiny candidate list") {
    // batchLimit=2 forces many small super-steps and exercises the
    // list-cutoff boundary (outside pairs strictly after in (count, lex))
    val corpus = (corpusDf.collect().map(r => (r.getLong(0), r.getString(1))) ++
      Seq((5L, ("maker " * 4).trim), (6L, ("taken " * 3).trim)))
      .toSeq.toDF("doc_id", "text")
    val local = Bpe.train(corpus, col("text"), nMerges = 14)
    val dist = Bpe.trainDistributed(
      Bpe.wordCounts(corpus.repartition(5), col("text")), 14, 2L, batchLimit = 2)
    assert(dist == local)
  }

  test("minPairCount stops the merge loop before noise merges") {
    val df = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // (a,b)=2 qualifies; (c,d)=1 is under the floor
    val merges = Bpe.train(df, col("text"), nMerges = 10)
    assert(merges == Seq(Bpe.Merge("a", "b")))
  }
}
