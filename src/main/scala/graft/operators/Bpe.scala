package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016; the GPT-2/tiktoken
  * merge-rank apply rule): corpus-trained merge table + distributed encode.
  *
  * The reference counts tokens with external BPE tokenizers — tiktoken
  * encodings / HuggingFace tokenizers in `TokenCountSplitter`
  * (reference python/pathway/xpacks/llm/splitters.py:104-151) — so token
  * budgeting there depends on a Python package. This module is the
  * engine-native equivalent: train a BPE vocabulary on the corpus itself and
  * encode/token-count documents with codegen-friendly distributed plumbing.
  *
  * Scale posture (the part that must survive 100 TB):
  *   - TRAIN touches the corpus exactly once: a (word, count) aggregation
  *     (one keyed shuffle with map-side combine). BPE learns from the
  *     word-frequency table — corpus size only changes the counts, not the
  *     table height, which is vocabulary-bounded (Heaps' law: ~1M distinct
  *     words per 100 GB of web text; the table is ~10 MB where the corpus is
  *     terabytes). The merge loop then runs over that table: driver-local
  *     when it fits under `maxDriverVocab` (the same bounded-collect contract
  *     as Clustering's LSH reps and Hnsw's query broadcast), distributed
  *     (one tiny job per merge, periodic localCheckpoint) above it. Both
  *     paths are pinned byte-identical by BpeSpec.
  *   - ENCODE is embarrassingly parallel: broadcast the ranked merges
  *     (a few KB), mapPartitions over documents with a per-partition
  *     word→tokens memo — Zipf makes the memo hit rate ≈ 1, so the greedy
  *     merge loop runs roughly once per DISTINCT word per partition, not once
  *     per occurrence.
  */
object Bpe {

  /** One learned merge: adjacent symbols `a`+`b` fuse into `a+b`. The rank is
    * the position in the returned sequence (earlier = higher priority). */
  final case class Merge(a: String, b: String)

  /** Pre-tokenization shared by train and encode: lower-cased whitespace
    * words (TextOps.tokens' discipline, so BPE composes with the text
    * battery and the DuckDB oracle's `string_split_regex`). Locale.ROOT so
    * JVM-side lowercasing is bit-identical to Spark/DuckDB `lower()`
    * regardless of the host's default locale (Turkish-I hazard). */
  private[graft] def words(text: String): Array[String] =
    text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)

  /** Symbolize a word by Unicode CODE POINT (not UTF-16 code unit), so
    * supplementary-plane characters are whole symbols, n_tokens never exceeds
    * the code-point length bound the oracle asserts, and symbol ordering is
    * well-defined across engines. */
  private[graft] def toSymbols(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Code-point lexicographic string order — identical to UTF-8 binary order
    * (Spark's string comparison), unlike Java's UTF-16 code-unit `<` which
    * mis-sorts supplementary-plane chars below U+E000..U+FFFF. Keeps the
    * driver trainer's tie-break bit-identical to the distributed trainer. */
  private[graft] def cpLt(x: String, y: String): Boolean = {
    var i = 0; var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i); val cy = y.codePointAt(j)
      if (cx != cy) return cx < cy
      i += Character.charCount(cx); j += Character.charCount(cy)
    }
    i >= x.length && j < y.length
  }

  /** Distributed (word, count) table — the single corpus-scale pass. */
  def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(filter(split(trim(lower(text)), "\\s+"), w => w =!= ""))
        .as("word"))
      .groupBy("word").count()

  /** Train `nMerges` merges from the corpus. Deterministic: the winning pair
    * maximizes (count, then lexicographically smallest (a, b)) — ties can't
    * depend on partitioning because counts are exact integers.
    *
    * minPairCount stops early once no pair repeats enough to matter. */
  def train(df: DataFrame, text: Column, nMerges: Int,
      minPairCount: Long = 2L, maxDriverVocab: Int = 2000000): Seq[Merge] =
    trainFromCounts(wordCounts(df, text), nMerges, minPairCount, maxDriverVocab)

  /** Train from a pre-computed (word, count) table — lets a pipeline that
    * also needs [[baseSymbolsFromCounts]] share ONE corpus word-count pass
    * (persist the table, consume it twice, unpersist). */
  def trainFromCounts(wc: DataFrame, nMerges: Int,
      minPairCount: Long = 2L, maxDriverVocab: Int = 2000000): Seq[Merge] = {
    val vocabSize = wc.count()
    if (vocabSize <= maxDriverVocab) {
      val local = wc.collect().map(r => (r.getString(0), r.getLong(1)))
      trainLocal(local, nMerges, minPairCount)
    } else trainDistributed(wc, nMerges, minPairCount)
  }

  /** Driver-local merge loop with incremental pair-count maintenance — the
    * classic Sennrich trainer. O(total pair updates), not O(vocab × merges):
    * each merge only re-counts the words that contain the winning pair. */
  private[graft] def trainLocal(wordCount: Array[(String, Long)], nMerges: Int,
      minPairCount: Long): Seq[Merge] = {
    // each word as a mutable symbol sequence
    val syms = wordCount.map { case (w, _) =>
      mutable.ArrayBuffer(toSymbols(w): _*)
    }
    val counts = wordCount.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addPair(p: (String, String), wi: Int, c: Long): Unit = {
      pairCount.updateWith(p) { v => Some(v.getOrElse(0L) + c) }
      pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
    }
    def dropPair(p: (String, String), c: Long): Unit =
      pairCount.updateWith(p) { v =>
        val n = v.getOrElse(0L) - c; if (n <= 0) None else Some(n)
      }
    for (wi <- syms.indices; Array(a, b) <- syms(wi).toArray.sliding(2))
      addPair((a, b), wi, counts(wi))

    val merges = mutable.ArrayBuffer.empty[Merge]
    var continue = true
    while (continue && merges.length < nMerges && pairCount.nonEmpty) {
      // max by (count, then smallest (a,b)): one scan of the pair table
      var best: ((String, String), Long) = null
      for (e <- pairCount)
        if (best == null || e._2 > best._2 ||
            (e._2 == best._2 && pairLt(e._1, best._1))) best = e
      if (best._2 < minPairCount) continue = false
      else {
        val (pa, pb) = best._1
        merges += Merge(pa, pb)
        val fused = pa + pb
        val affected = pairWords.getOrElse(best._1, mutable.Set.empty).toArray
        for (wi <- affected) {
          val s = syms(wi); val c = counts(wi)
          // remove this word's pair contributions, re-add after merging
          for (Array(a, b) <- s.toArray.sliding(2)) dropPair((a, b), c)
          var i = 0
          while (i < s.length - 1) {
            if (s(i) == pa && s(i + 1) == pb) { s(i) = fused; s.remove(i + 1) }
            i += 1
          }
          for (Array(a, b) <- s.toArray.sliding(2)) addPair((a, b), wi, c)
        }
        pairWords.remove(best._1)
      }
    }
    merges.toSeq
  }

  /** Distributed merge loop for vocabularies beyond the driver bound: the
    * symbolized word table lives in the cluster; each iteration is one pair
    * aggregation + a 1-row argmax collect + a narrow merge-apply map.
    * localCheckpoint every few passes keeps lineage flat (Iterate's rule). */
  private[graft] def trainDistributed(wc: DataFrame, nMerges: Int,
      minPairCount: Long): Seq[Merge] = {
    val spark = wc.sparkSession
    import spark.implicits._
    var vocab = wc.select(col("word"), col("count"))
      .as[(String, Long)]
      .map { case (w, c) => (toSymbols(w), c) }
      .toDF("syms", "cnt")
      .persist()
    vocab.count()
    val merges = mutable.ArrayBuffer.empty[Merge]
    var continue = true
    while (continue && merges.length < nMerges) {
      val top = vocab.select(posexplode(col("syms")).as(Seq("_i", "_a")), col("syms"), col("cnt"))
        .filter(col("_i") < size(col("syms")) - 1)
        .select(col("_a").as("a"), col("syms")(col("_i") + 1).as("b"), col("cnt"))
        .groupBy("a", "b").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) continue = false
      else {
        val (pa, pb) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(pa, pb)
        val old = vocab
        val applied0 = old.as[(Array[String], Long)]
          .map { case (s, c) => (applyMerge(s, pa, pb), c) }
          .toDF("syms", "cnt")
        // checkpoint (not just persist) every few merges: the plan nests one
        // map per merge, and an unbounded lineage makes pass N's ANALYSIS
        // cost O(N) even when every ancestor is cached
        val applied =
          if (merges.length % 8 == 0) applied0.localCheckpoint(eager = true)
          else { val p = applied0.persist(); p.count(); p }
        old.unpersist()
        vocab = applied
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  private def pairLt(x: (String, String), y: (String, String)): Boolean =
    cpLt(x._1, y._1) || (x._1 == y._1 && cpLt(x._2, y._2))

  private[graft] def applyMerge(s: Array[String], a: String, b: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** Greedy BPE apply (HF `bpe` loop): repeatedly fuse the lowest-rank
    * adjacent pair until none of the pairs present is a known merge. */
  private[graft] def encodeWord(w: String,
      rank: collection.Map[(String, String), Int]): Array[String] = {
    var s = toSymbols(w)
    var done = false
    while (!done && s.length > 1) {
      var bi = -1; var br = Int.MaxValue
      var i = 0
      while (i < s.length - 1) {
        val r = rank.getOrElse((s(i), s(i + 1)), Int.MaxValue)
        if (r < br) { br = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else s = applyMerge(s, s(bi), s(bi + 1))
    }
    s
  }

  /** Encode: (id, tokens array, token count, round-trip flag). One narrow
    * mapPartitions; merges broadcast; per-partition word memo. */
  def encode(df: DataFrame, id: Column, text: Column,
      merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    val rankB = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (m, i) => ((m.a, m.b), i) }.toMap)
    val in = df.select(id.cast("long").as("id"), text.cast("string").as("_t"))
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tokens", ArrayType(StringType, containsNull = false)),
      StructField("n_tokens", LongType, nullable = false),
      StructField("roundtrip_ok", BooleanType, nullable = false)))
    in.mapPartitions { it =>
      val rank = rankB.value
      val memo = mutable.HashMap.empty[String, Array[String]]
      it.map { r =>
        val docId = r.getLong(0)
        val ws = words(Option(r.getString(1)).getOrElse(""))
        val toks = ws.flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, rank)))
        // round-trip: token concatenation per word reassembles the word —
        // checked against the normalized text both engines can compute
        var ok = true
        var ti = 0
        for (w <- ws) {
          val sb = new StringBuilder
          while (sb.length < w.length && ti < toks.length) { sb ++= toks(ti); ti += 1 }
          if (sb.toString != w) ok = false
        }
        if (ti != toks.length) ok = false
        Row(docId, toks.toSeq, toks.length.toLong, ok)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Token count per document under a trained vocabulary — the
    * TokenCountSplitter budget measure, engine-native. */
  def tokenCount(df: DataFrame, id: Column, text: Column,
      merges: Seq[Merge]): DataFrame =
    encode(df, id, text, merges).select(col("id"), col("n_tokens"))

  /** Base single-character symbols of the training corpus, sorted — the
    * char-level floor of the vocabulary (every encodable word decomposes
    * into these plus merge outputs). */
  def baseSymbols(df: DataFrame, text: Column): Seq[String] =
    baseSymbolsFromCounts(wordCounts(df, text))

  /** Base symbols from a pre-computed (word, count) table (see
    * [[trainFromCounts]] for the shared-pass discipline). */
  def baseSymbolsFromCounts(wc: DataFrame): Seq[String] = {
    val spark = wc.sparkSession
    import spark.implicits._
    // code-point symbols (toSymbols), sorted in code-point (= UTF-8 binary)
    // order so driver and distributed vocabularies agree
    wc.select(col("word")).as[String]
      .flatMap(toSymbols(_).toSeq)
      .distinct()
      .collect().sortWith(cpLt).toSeq
  }

  /** Token-id vocabulary: base chars first (sorted), then merge outputs in
    * rank order (duplicates keep the earlier id). Id = position. */
  def vocabulary(merges: Seq[Merge], base: Seq[String]): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    base.foreach(out += _)
    merges.foreach(m => out += (m.a + m.b))
    out.toSeq
  }

  /** Encode to integer token ids (training-tensor currency): tokens outside
    * the vocabulary (unseen characters) map to −1, the conventional UNK
    * sentinel the caller can filter or remap. */
  def encodeIds(df: DataFrame, id: Column, text: Column, merges: Seq[Merge],
      vocab: Seq[String]): DataFrame = {
    // literal-map lookup stays codegen'd (vocab is merge-bounded — a few
    // hundred entries); no UDF
    val vmap = typedLit(vocab.zipWithIndex.toMap)
    encode(df, id, text, merges)
      .select(col("id"),
        transform(col("tokens"),
          t => coalesce(element_at(vmap, t), lit(-1))).as("token_ids"),
        col("n_tokens"), col("roundtrip_ok"))
  }
}
