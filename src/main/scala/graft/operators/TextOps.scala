package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines (builder-prompt first-class
  * surface; composes the reference's LLM xpack splitters/scoring ideas,
  * reference python/pathway/xpacks/llm/splitters.py).
  *
  * Everything is built-in HOFs/regex — codegen'd, no UDFs, safe at 100 TB: these are
  * embarrassingly parallel rowwise transforms with no shuffle.
  */
object TextOps {

  /** Whitespace tokens (lowercased). */
  def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** Word tokens: ASCII word runs — the "BPE-ish regex" token estimate. */
  def wordTokens(c: Column): Column = regexp_extract_all(lower(c), lit("[a-z0-9']+"), lit(0))

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")
  def wordCount(c: Column): Column = size(wordTokens(c)).cast("long")

  // ── quality scoring (length/punct/stopword ratios) ──────────────────────────
  private val EnStop = Seq("the", "a", "and", "of", "to", "in", "is", "it", "you", "that")

  def charCount(c: Column): Column = length(c).cast("long")
  def alphaRatio(c: Column): Column =
    length(regexp_replace(c, "[^a-zA-Z]", "")).cast("double") / length(c)
  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[^.,;:!?'\"]", "")).cast("double") / length(c)
  def stopwordRatio(c: Column): Column = {
    val stops = array(EnStop.map(lit): _*)
    size(filter(tokens(c), t => array_contains(stops, t))).cast("double") / size(tokens(c))
  }
  /** Σ length(token) = length of the token concatenation — keeps the whole
    * expression codegen'd (an `aggregate` fold here is interpreted per
    * token × per document, a corpus-scan tax). Exact same integer sum. */
  def meanWordLen(c: Column): Column =
    length(array_join(wordTokens(c), "")).cast("double") / size(wordTokens(c))

  /** Composite [0,1] quality heuristic (weights pinned; deterministic). */
  def qualityScore(c: Column): Column =
    least(lit(1.0), greatest(lit(0.0),
      lit(0.4) * least(lit(1.0), size(tokens(c)).cast("double") / 100.0) +
      lit(0.3) * stopwordRatio(c) +
      lit(0.3) * (lit(1.0) - punctRatio(c))))

  // ── Gopher quality rules (Rae et al. 2021 §A1.1 — the standard public
  //    pre-training document-filter battery) ──────────────────────────────────
  private val GopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** n-gram orders computed by the repetition kernel (Rae et al. Table A1:
    * most-common-n-gram for n∈{2,3,4}, duplicate-n-gram for n∈{5..10};
    * n=2 additionally keeps the legacy dup-2-gram rule). */
  val GopherGramNs: Range = 2 to 10
  /** Thresholds (count-fraction adaptation of Rae et al. Table A1 — the
    * paper states character fractions; we use gram-count fractions so every
    * stat is exact-integer ÷ exact-integer and engine-portable). */
  val GopherTopGramMax: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val GopherDupGramMax: Map[Int, Double] =
    Map(2 -> 0.30, 5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** Output stat columns of [[gopherStats]], in order. */
  val gopherStatNames: Seq[String] =
    Seq("n_words", "mean_word_len", "symbol_word_ratio", "bullet_line_frac",
      "ellipsis_line_frac", "dup_line_frac", "alpha_word_frac", "stop_word_hits") ++
      GopherTopGramMax.keys.toSeq.sorted.map(n => s"top_${n}gram_frac") ++
      GopherDupGramMax.keys.toSeq.sorted.map(n => s"dup_${n}gram_frac") :+
      "gopher_pass"

  /** Appends the full Gopher stat battery to `df` (columns [[gopherStatNames]]).
    *
    * The n-gram repetition family (most-common / duplicate n-gram fractions
    * for every n in [[GopherGramNs]]) runs in a single mapPartitions kernel:
    * per document, one pass per n builds a gram→count open hash map and emits
    * (total, distinct, topCount) as exact integers — O(Σn · words) per doc,
    * linear in document length, so book-length (100k-word) documents cost
    * ~10⁶ map ops, not the 10¹⁰ comparisons of a nested per-distinct-gram
    * scan (the r9 O(n²) HOF this kernel replaces; same shape as the MinHash
    * signature kernel in Dedup.scala and tokenWindowHashes in TrainPrep.scala).
    * Tokenization stays the codegen'd `wordTokens` expression so the gram
    * vocabulary is bit-identical to the word-level stats and DuckDB oracle.
    *
    * Everything else (line rules, word-length/stopword stats) derives from
    * exact integer counts with ONE final division, so the DuckDB oracle
    * matches bit-for-bit. Zero-word/zero-line docs null their ratios (nullif
    * guard) and fail the pass flag via coalesce — never divide-by-zero. */
  def gopherStats(df: DataFrame, text: Column): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val inCols = df.columns.toSeq
    val withWords = df.withColumn("_gtext", text)
      .withColumn("_gwords", wordTokens(col("_gtext")))
    val wIdx = withWords.schema.fieldIndex("_gwords")
    val outSchema = withWords.schema
      .add("_gk", ArrayType(LongType, containsNull = false), nullable = false)
    val ns = GopherGramNs.toArray
    val kerneled = withWords.mapPartitions { rows =>
      rows.map { row =>
        val ws = row.getSeq[String](wIdx)
        // layout: for each n (ascending): [total, distinct, topCount]
        val out = new Array[Long](ns.length * 3)
        if (ws != null && ws.nonEmpty) {
          val arr = ws.toArray
          val sb = new java.lang.StringBuilder(64)
          var k = 0
          while (k < ns.length) {
            val n = ns(k)
            val m = arr.length - n + 1
            if (m > 0) {
              val hm = new java.util.HashMap[String, Integer](
                math.min(m * 2, 1 << 16))
              var top = 0
              var i = 0
              while (i < m) {
                sb.setLength(0)
                var j = 0
                while (j < n) {
                  if (j > 0) sb.append(' ')
                  sb.append(arr(i + j))
                  j += 1
                }
                val g = sb.toString
                val prev = hm.get(g)
                val c = if (prev == null) 1 else prev.intValue + 1
                hm.put(g, Integer.valueOf(c))
                if (c > top) top = c
                i += 1
              }
              out(k * 3) = m.toLong
              out(k * 3 + 1) = hm.size.toLong
              out(k * 3 + 2) = top.toLong
            }
            k += 1
          }
        }
        Row.fromSeq(row.toSeq :+ (out.toSeq: Seq[Long]))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))

    val c = col("_gtext")
    val words = col("_gwords")
    def tot(n: Int) = element_at(col("_gk"), GopherGramNs.indexOf(n) * 3 + 1)
    def dist(n: Int) = element_at(col("_gk"), GopherGramNs.indexOf(n) * 3 + 2)
    def topCnt(n: Int) = element_at(col("_gk"), GopherGramNs.indexOf(n) * 3 + 3)
    // empty-gram docs: total=0 → nullif → null fraction (old HOF's null too)
    def topFrac(n: Int) =
      when(tot(n) === 0, lit(null).cast("double"))
        .otherwise(topCnt(n).cast("double") / tot(n).cast("double"))
    def dupFrac(n: Int) =
      when(tot(n) === 0, lit(null).cast("double"))
        .otherwise((tot(n) - dist(n)).cast("double") / tot(n).cast("double"))
    val nWords = size(words).cast("long")
    val nWordsD = nullif(size(words), lit(0)).cast("double")
    val meanWlen = length(array_join(words, "")).cast("double") /
      nullif(size(words), lit(0))
    val symbols = (size(regexp_extract_all(c, lit("#"), lit(0))) +
      size(regexp_extract_all(c, lit("\\.\\.\\.|…"), lit(0)))).cast("double")
    val lines = split(c, "\n")
    val nLinesD = nullif(size(lines), lit(0)).cast("double")
    val bulletFrac = size(filter(lines, l => ltrim(l).rlike("^[-*•]")))
      .cast("double") / nLinesD
    val ellipsisFrac = size(filter(lines, l => rtrim(l).rlike("(\\.\\.\\.|…)$")))
      .cast("double") / nLinesD
    val dupLineFrac = (size(lines) - size(array_distinct(lines)))
      .cast("double") / nLinesD
    val alphaFrac = size(filter(words, w => w.rlike("[a-z]")))
      .cast("double") / nWordsD
    val stopHits = size(filter(words, w => w.isin(GopherStops: _*))).cast("long")
    val symbolRatio = symbols / nWordsD
    val gramRules = (GopherTopGramMax.toSeq.sortBy(_._1).map { case (n, t) =>
        topFrac(n) <= t
      } ++ GopherDupGramMax.toSeq.sortBy(_._1).map { case (n, t) =>
        dupFrac(n) <= t
      }).reduce(_ && _)
    val pass = coalesce(
      nWords >= 50 && nWords <= 100000 &&
        meanWlen >= 3.0 && meanWlen <= 10.0 &&
        symbolRatio <= 0.1 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
        dupLineFrac <= 0.3 && alphaFrac >= 0.8 && stopHits >= 2 &&
        gramRules,
      lit(false))
    val statCols: Seq[(String, Column)] = Seq(
      "n_words" -> nWords,
      "mean_word_len" -> meanWlen,
      "symbol_word_ratio" -> symbolRatio,
      "bullet_line_frac" -> bulletFrac,
      "ellipsis_line_frac" -> ellipsisFrac,
      "dup_line_frac" -> dupLineFrac,
      "alpha_word_frac" -> alphaFrac,
      "stop_word_hits" -> stopHits) ++
      GopherTopGramMax.keys.toSeq.sorted.map(n => s"top_${n}gram_frac" -> topFrac(n)) ++
      GopherDupGramMax.keys.toSeq.sorted.map(n => s"dup_${n}gram_frac" -> dupFrac(n)) :+
      ("gopher_pass" -> pass)
    kerneled.select(inCols.map(col) ++
      statCols.map { case (nm, cc) => cc.as(nm) }: _*)
  }

  // ── C4 line-level cleaning (Raffel et al. 2020 §2.2 — the other standard
  //    public cleaning battery; line rules complement Gopher's doc rules) ──────

  /** C4 line filter + page flags. `clean_text` keeps only lines that end in
    * terminal punctuation (`.`, `!`, `?`, or a closing quote after one) AND
    * have ≥ `minLineWords` words, rejoined with newlines; pages carrying
    * "lorem ipsum" or a curly brace (code) are flagged for whole-doc removal
    * (`c4_drop`). Everything is list/filter built-ins over exact counts, so
    * the DuckDB oracle matches bit-for-bit. */
  def c4Stats(c: Column, minLineWords: Int = 3): Seq[(String, Column)] = {
    val lines = split(c, "\n")
    val kept = filter(lines, l =>
      rtrim(l).rlike("""[.!?]["']?$""") &&
        size(regexp_extract_all(lower(l), lit("[a-z0-9']+"), lit(0))) >= minLineWords)
    val cleanText = array_join(kept, "\n")
    val hasLorem = lower(c).contains("lorem ipsum")
    val hasBrace = c.contains("{")
    Seq(
      "n_lines" -> size(lines).cast("long"),
      "n_kept_lines" -> size(kept).cast("long"),
      "clean_text" -> cleanText,
      "has_lorem" -> hasLorem,
      "has_brace" -> hasBrace,
      "c4_drop" -> (hasLorem || hasBrace || size(kept) === 0))
  }

  /** CCNet-style corpus-level boilerplate removal: a line whose normalized
    * form (trim + lowercase) repeats more than `maxRepeat` times ACROSS THE
    * CORPUS is boilerplate (cookie banners, nav menus, footers) and is
    * dropped from every document; surviving lines are reassembled in their
    * original order. Returns (id, n_lines, n_kept_lines, clean_text,
    * boiler_frac).
    *
    * Scale shape: posexplode → one corpus-wide count aggregation on the line
    * key → equi-join back → per-doc reassembly aggregation. Everything is a
    * keyed shuffle, no per-doc state beyond its own lines; with
    * `hashKeys = true` (default) the count/join key is xxhash64 of the
    * normalized line, so wide lines don't ship twice through the shuffle —
    * the same 64-bit-line-hash practice CCNet uses at web scale (collision
    * risk only merges counts of two distinct lines, which at worst drops an
    * extra line — acceptable for curation, set false for exactness). */
  def removeBoilerplate(df: DataFrame, id: Column, text: Column,
      maxRepeat: Int = 2, hashKeys: Boolean = true): DataFrame = {
    val lines = df.select(id.as("id"), text.as("_t"))
      .select(col("id"), size(split(col("_t"), "\n")).cast("long").as("n_lines"),
        posexplode(split(col("_t"), "\n")).as(Seq("_pos", "_line")))
    val norm = trim(lower(col("_line")))
    val keyed = lines.withColumn("_k", if (hashKeys) xxhash64(norm) else norm)
    val counts = keyed.groupBy("_k").agg(count(lit(1)).as("_c"))
    val kept = keyed.join(counts, Seq("_k"))
      .filter(col("_c") <= maxRepeat)
      .groupBy("id").agg(
        first(col("n_lines")).as("n_lines"),
        count(lit(1)).as("n_kept_lines"),
        array_join(transform(
          array_sort(collect_list(struct(col("_pos"), col("_line")))),
          x => x.getField("_line")), "\n").as("clean_text"))
    // docs whose every line was boilerplate drop out of `kept` — restore them
    df.select(id.as("id"), size(split(text, "\n")).cast("long").as("_nl"))
      .join(kept, Seq("id"), "left_outer")
      .select(col("id"),
        col("_nl").as("n_lines"),
        coalesce(col("n_kept_lines"), lit(0L)).as("n_kept_lines"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        ((col("_nl") - coalesce(col("n_kept_lines"), lit(0L))).cast("double") /
          col("_nl")).as("boiler_frac"))
  }

  /** CCNet-style language-model quality score, exact: train a Laplace-
    * smoothed bigram model on the corpus itself (CCNet trains KenLM on a
    * reference corpus and filters by perplexity band; the deterministic
    * in-engine analog scores each document by its MEAN CONDITIONAL BIGRAM
    * PROBABILITY under corpus counts — monotone in the same signal, free of
    * transcendental log so both engines agree bit-for-bit).
    *
    *   P(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁·) + V)
    *   score(doc) = Σ_positions P / n_bigrams   (left-fold in position order)
    *
    * Every quantity is an integer below 2⁵³, each division is one IEEE op,
    * and the sum is an ordered left fold — the cross-engine-exact float
    * discipline the cosine oracles established. Returns (id, n_bigrams,
    * lm_score); n_bigrams = 0 rows carry a NULL score.
    *
    * Scale shape: posexplode → lag window per doc (keyed shuffle + sort) →
    * count aggregations with map-side combine → two equi-joins back on
    * token keys (frequent-word skew is AQE skew-join territory; the unigram
    * side is vocabulary-bounded and broadcasts when small) → one per-doc
    * ordered-fold aggregation. Linear end to end, no all-pairs. */
  def bigramLmScore(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = df.select(id.as("id"), wordTokens(text).as("_toks"))
    val pos = toks.select(col("id"),
        posexplode(col("_toks")).as(Seq("_pos", "_w")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("_pos")
    val bi = pos.withColumn("_w1", lag(col("_w"), 1).over(w))
      .filter(col("_w1").isNotNull)
      .select(col("id"), col("_pos"), col("_w1"), col("_w").as("_w2"))
    val biCounts = bi.groupBy("_w1", "_w2").agg(count(lit(1)).as("_c12"))
    val prefCounts = bi.groupBy("_w1").agg(count(lit(1)).as("_c1"))
    val vocab = pos.select(countDistinct(col("_w")).as("_v"))
    val ratios = bi
      .join(biCounts, Seq("_w1", "_w2"))
      .join(prefCounts, Seq("_w1"))
      .crossJoin(broadcast(vocab))
      .select(col("id"), col("_pos"),
        ((col("_c12") + lit(1)).cast("double") /
          (col("_c1") + col("_v")).cast("double")).as("_r"))
    val scored = ratios.groupBy("id").agg(
      count(lit(1)).as("n_bigrams"),
      aggregate(
        transform(array_sort(collect_list(struct(col("_pos"), col("_r")))),
          x => x.getField("_r")),
        lit(0.0), (acc, x) => acc + x).as("_sum"))
    toks.select(col("id"))
      .join(scored, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (col("_sum") / col("n_bigrams").cast("double")).as("lm_score"))
  }

  // ── language id (fixed stopword lists, deterministic argmax) ────────────────
  private val LangStops: Seq[(String, Seq[String])] = Seq(
    "en" -> EnStop,
    "de" -> Seq("der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "je", "ne", "pas", "un", "pour"),
    "es" -> Seq("el", "los", "y", "es", "no", "un", "por", "que", "con", "para"))

  def langHits(c: Column, lang: String): Column = {
    val stops = array(LangStops.toMap.apply(lang).map(lit): _*)
    size(filter(tokens(c), t => array_contains(stops, t))).cast("long")
  }

  /** Predicted language: argmax of per-language stopword hits; ties resolve in
    * LangStops order; all-zero → 'und'. */
  def langId(c: Column): Column = {
    val hits = LangStops.map { case (l, _) => l -> langHits(c, l) }
    val maxHits = greatest(hits.map(_._2): _*)
    hits.foldRight(lit("und")) { case ((l, h), acc) =>
      when(h === maxHits && maxHits > 0, lit(l)).otherwise(acc)
    } match {
      // foldRight gives earlier langs precedence on ties (en first)
      case c0 => c0
    }
  }

  // ── URL filtering (RefinedWeb-style source hygiene) ─────────────────────────
  /** Default banned URL substrings with weights — the RefinedWeb (Penedo et
    * al. 2023 §3.1) soft-wordlist idea: one strong hit or several weak ones
    * push the score over the drop threshold. */
  val UrlBannedDefault: Seq[(String, Double)] = Seq(
    "casino" -> 1.0, "viagra" -> 1.0, "porn" -> 1.0, "xxx" -> 1.0,
    "free-download" -> 0.5, "coupon" -> 0.5, "webcam" -> 0.5)

  /** Per-URL hygiene battery: parsed domain, blocklist membership (exact or
    * parent-domain suffix), weighted banned-substring score, IP-literal
    * hosts, and the composite drop flag. Everything is rowwise regex/string
    * work on codegen'd built-ins — no shuffle, no UDF; the blocklist and
    * wordlist are compile-time literal OR-chains (web-scale blocklists would
    * broadcast-join a domain table instead — same semantics, one equi-join).
    */
  def urlStats(url: Column, blockedDomains: Seq[String],
      banned: Seq[(String, Double)] = UrlBannedDefault,
      scoreMax: Double = 1.0): Seq[(String, Column)] = {
    val u = lower(url)
    val domain = regexp_extract(u, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    val blocked = blockedDomains.map(d =>
        domain === lit(d) || domain.endsWith("." + d))
      .foldLeft(lit(false))(_ || _)
    // banned words must be regex-metacharacter-free (they're substrings);
    // counts × dyadic weights make the score sum order-independent-exact
    val score = banned.map { case (w, wt) =>
      size(regexp_extract_all(u, lit(w), lit(0))).cast("double") * wt
    }.reduceLeft(_ + _)
    val ipHost = domain.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$")
    Seq(
      "domain" -> domain,
      "blocked_domain" -> blocked,
      "url_score" -> score,
      "ip_host" -> ipHost,
      "url_drop" -> (blocked || ipHost || (score >= scoreMax)))
  }

  // ── fingerprinting ───────────────────────────────────────────────────────────
  /** Content fingerprint: md5 over whitespace-normalized lowercase text. */
  def fingerprintMd5(c: Column): Column =
    md5(regexp_replace(trim(lower(c)), "\\s+", " "))

  /** 64-bit rolling (polynomial) hash over chars — base 257 mod 2^64, the classic
    * Rabin-Karp fingerprint, as a codegen'd HOF fold. */
  def rollingHash(c: Column): Column =
    aggregate(split(c, ""), lit(0L), (acc, ch) => acc * 257L + ascii(ch).cast("long"))

  // ── splitter (xpacks/llm/splitters.py: token-count chunker) ──────────────────
  /** Chunk into `chunkSize`-token windows advancing by (chunkSize − overlap); one
    * output row per chunk via posexplode. Adds chunk_idx, chunk_text, n_chunk_tokens. */
  def splitIntoChunks(df: DataFrame, text: Column, chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap < chunkSize, "overlap must be < chunkSize")
    val step = chunkSize - overlap
    val toks = tokens(text)
    val nChunks = greatest(ceil((size(toks) - lit(overlap)).cast("double") / step), lit(1))
      .cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => slice(toks, i * step + 1, lit(chunkSize)))
    df.withColumn("_chunks", chunks)
      .select(df.columns.map(col) :+ posexplode(col("_chunks")).as(Seq("chunk_idx", "_ctoks")): _*)
      .withColumn("chunk_text", array_join(col("_ctoks"), " "))
      .withColumn("n_chunk_tokens", size(col("_ctoks")).cast("long"))
      .drop("_chunks", "_ctoks")
  }

  // ── BM25 (stdlib/indexing/bm25.py:41 TantivyBM25 → pure Spark aggregates) ────
  /** Per-(doc, term) BM25 components for a fixed term list. Returns
    * (id, term, score): tf-part × idf with k1/b pinned. Aggregates (N, df,
    * avg_len) are exact-integer; the float formula is order-pinned so results
    * are engine-portable. At scale: one groupBy over exploded tokens, then a
    * broadcast join of the tiny per-term df table back onto docs. */
  def bm25PerTerm(docs: DataFrame, id: Column, text: Column, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
      tokenize: Column => Column = tokens): DataFrame = {
    val spark = docs.sparkSession
    // default = whitespace tokens (the oracle-pinned shape); pass
    // [[wordTokens]] for tantivy-style alphanumeric-run tokenization
    // (punctuation stripped), which test_full_text_search assumes
    val toks = tokenize(text)
    // no cache: tokenization is codegen'd regexp, so the three consumers
    // (scalars, df, tf) just rescan — cheaper than pinning the tokenized
    // corpus in memory at scale, and nothing is left persisted behind
    // (r2 leaked this cache). Both driver scalars come from ONE job.
    val base = docs.select(id.as("id"), toks.as("_toks"), size(toks).cast("long").as("_dl"))
    val r = base.agg(count(lit(1)), avg(col("_dl"))).head
    val n = r.getLong(0) // N docs (driver scalar: two-pass like any TF-IDF build)
    // an EMPTY corpus (e.g. a pre-filter that matched nothing) has no avgdl:
    // BM25 over nothing is the empty score table, not an NPE
    if (n == 0)
      return base.select(col("id"), lit("").as("term"), lit(0.0).as("score")).limit(0)
    val avgdl = r.getDouble(1)

    val tf = base
      .select(col("id"), col("_dl"), explode(col("_toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("id"), col("term"), col("_dl")).agg(count(lit(1)).as("tf"))

    // df derives from tf's OWN aggregate (r21, guide §2.4): tf holds exactly
    // one row per (doc, matching term), so count-of-rows per term IS the
    // document frequency — the old separate array_distinct+explode pass was
    // a second full tokenize+scan of the corpus for a number the first pass
    // already determines. The shared tf subtree's exchange is canonically
    // identical under both consumers, so AQE stage reuse runs it once.
    // Input contract made explicit by this derivation: `id` identifies a
    // document (one row per id). Duplicate-id rows were ill-defined before
    // too — tf's groupBy merged them while the old df counted them per row,
    // an inconsistent hybrid; now both sides agree on the merged reading.
    val termDf = tf.groupBy("term").agg(count(lit(1)).as("df"))

    tf.join(broadcast(termDf), "term")
      .withColumn("idf",
        log((lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      // division before the idf multiply — parenthesized identically in the
      // DuckDB oracle (DuckDB reassociates a*b/c to a*(b/c); pin that shape)
      .withColumn("score",
        col("idf") * ((col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("_dl") / avgdl))))
      .select(col("id"), col("term"), col("score"))
  }

  // ── rerankers (xpacks/llm/rerankers.py: CrossEncoder/LLMReranker +
  //    rerank_topk_filter) ──────────────────────────────────────────────────────
  /** Deterministic lexical relevance: |tokens(q) ∩ tokens(d)| / |tokens(q)|
    * over distinct word tokens — the built-in scorer (an LLM/cross-encoder
    * scorer plugs into the same shape through AsyncTransformer). */
  def lexicalOverlapScore(qText: Column, dText: Column): Column = {
    val qt = array_distinct(wordTokens(qText))
    size(array_intersect(qt, array_distinct(wordTokens(dText)))).cast("double") /
      size(qt).cast("double")
  }

  /** Rerank candidate (query, doc) pairs: score with `scorer`, keep top-k per
    * query (ties → smaller doc id; reference rerank_topk_filter). Candidates
    * come from any upstream retriever (BM25/KNN); this is the second-stage
    * rerank, so the scored set is small and the window cheap. */
  def rerankTopK(candidates: DataFrame, queryId: Column, qText: Column,
      docId: Column, dText: Column, k: Int,
      scorer: (Column, Column) => Column = lexicalOverlapScore): DataFrame = {
    val scored = candidates.select(queryId.as("q_id"), docId.as("doc_id"),
      scorer(qText, dText).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** The reference's EXACT fuzzy_match / fuzzy_self_match
    * (stdlib/ml/smart_table_ops/_fuzzy_join.py, r16 decode of
    * tests/test_fuzzy_join.py).
    *
    * Inputs: per-side edges (node, feature, weight) and a feature table
    * (feature, weight, norm_type ∈ weight|logweight|none). Semantics:
    *   - feature popularity cnt = edge count over BOTH sides; the effective
    *     feature weight is `weight × norm(cnt)` with WEIGHT = 1/2^⌈log2 cnt⌉,
    *     LOGWEIGHT = 1/⌈log2(cnt+1)⌉, NONE = cnt;
    *   - pair score = Σ over shared features of wL·wR·effective;
    *   - HEAVY features (cnt ≥ threshold, default 100) never GENERATE pairs —
    *     the hot-key quadratic blowup guard — but their contributions are
    *     added to pairs the light features already produced (the reference's
    *     node_node_heavy join): at 100 TB this is exactly the hot-bucket
    *     discipline the dedup family uses;
    *   - selection: per-left argmax then per-right argmax over the
    *     pseudoweight (weight, min(ids), max(ids)) — mutual-best pairs
    *     survive; self-match feeds one edge set, drops the diagonal, and
    *     keeps left < right.
    * Output: (left, right, weight). */
  def fuzzyMatch(edgesLeft: DataFrame, edgesRight: DataFrame, features: DataFrame,
      heavyLightThreshold: Long = 100L, selfMatch: Boolean = false): DataFrame = {
    val eL = edgesLeft.select(col("node").as("ln"), col("feature").as("f"),
      col("weight").as("lw"))
    val eR = edgesRight.select(col("node").as("rn"), col("feature").as("f"),
      col("weight").as("rw"))
    // popularity over BOTH sides (the reference concats; self-match uses one set)
    val cntSrc = if (selfMatch) eL.select("f")
      else eL.select("f").unionAll(eR.select("f"))
    val cnt = cntSrc.groupBy("f").agg(count(lit(1)).as("cnt"))
    // EXACT integer ⌈log2 n⌉ = bit length of n−1 (floating log2 overshoots
    // at powers of two: JVM log2(2^29) = 29.000000000000004, whose ceil
    // halves the weight — the reference's math.log2 is exact there)
    def ceilLog2(n: Column): Column =
      when(n <= 1, lit(0)).otherwise(length(bin(n - 1)))
    val norm = when(col("cnt") === 0, lit(0.0))
      .when(lower(col("norm_type")) === "weight",
        lit(1.0) / pow(lit(2.0), ceilLog2(col("cnt"))))
      .when(lower(col("norm_type")) === "logweight",
        lit(1.0) / ceilLog2(col("cnt") + 1)) // = bit length of cnt
      .otherwise(col("cnt").cast("double"))
    val fEff = features.select(col("feature").as("f"), col("weight").as("fw"),
        col("norm_type"))
      .join(cnt, Seq("f"), "left")
      .select(col("f"),
        (col("fw") * when(col("cnt").isNull, lit(0.0)).otherwise(norm)).as("eff"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val lightF = fEff.filter(col("cnt") < heavyLightThreshold)
    val heavyF = fEff.filter(col("cnt") >= heavyLightThreshold)
    val lLight = eL.join(lightF.select("f", "eff"), "f")
    val rLight = eR.join(lightF.select("f", "eff"), "f")
    val lightPairsRaw = lLight.join(rLight.withColumnRenamed("eff", "effr"), "f")
      .filter(if (selfMatch) col("ln") =!= col("rn") else lit(true))
      .select(col("ln"), col("rn"), (col("lw") * col("rw") * col("eff")).as("w"))
    val lightPairs = lightPairsRaw.groupBy("ln", "rn").agg(sum("w").as("w"))
    // heavy contributions attach to EXISTING light pairs only
    val heavyAdd = lightPairs.select(col("ln").as("pl"), col("rn").as("pr"))
      .join(eL.join(heavyF.select("f", "eff"), "f")
        .select(col("ln").as("pl"), col("f"), col("lw"), col("eff").as("heff")), "pl")
      .join(eR.select(col("rn").as("pr"), col("f"), col("rw")), Seq("pr", "f"))
      .select(col("pl").as("ln"), col("pr").as("rn"),
        (col("lw") * col("rw") * col("heff")).as("w"))
    val all = lightPairs.select("ln", "rn", "w").unionByName(heavyAdd)
      .groupBy("ln", "rn").agg(sum("w").as("w"))
    // pseudoweight (w, min(ids), max(ids)); mutual argmax, ties deterministic
    val pseudo = struct(col("w"),
      least(col("ln"), col("rn")), greatest(col("ln"), col("rn")))
    val byLeft = all.groupBy("ln").agg(
      max_by(struct(col("rn"), col("w")), pseudo).as("best"))
      .select(col("ln"), col("best.rn").as("rn"), col("best.w").as("w"))
    val byRight = byLeft.groupBy("rn").agg(
      max_by(struct(col("ln"), col("w")), pseudo).as("best"))
      .select(col("best.ln").as("left"), col("rn").as("right"), col("best.w").as("weight"))
    if (selfMatch) byRight.filter(col("left") < col("right")) else byRight
  }

  /** fuzzy_self_match: one edge set against itself. */
  def fuzzySelfMatch(edges: DataFrame, features: DataFrame,
      heavyLightThreshold: Long = 100L): DataFrame =
    fuzzyMatch(edges, edges, features, heavyLightThreshold, selfMatch = true)

  // ── fuzzy join (stdlib/ml/smart_table_ops/_fuzzy_join.py:43) ─────────────────
  /** Token-overlap fuzzy join: for each left row, the right row sharing the most
    * distinct tokens (tie → smallest right id). Explode-join-reaggregate — the
    * shuffle key is the token, so common-token skew is the thing to watch; pass
    * a stopword-filtered tokenizer for production use. */
  def fuzzyJoin(l: DataFrame, lId: Column, lText: Column,
      r: DataFrame, rId: Column, rText: Column): DataFrame = {
    val lTok = l.select(lId.as("l_id"), explode(array_distinct(tokens(lText))).as("tok"))
    val rTok = r.select(rId.as("r_id"), explode(array_distinct(tokens(rText))).as("tok"))
    lTok.join(rTok, "tok")
      .groupBy("l_id", "r_id").agg(count(lit(1)).as("n_shared"))
      .groupBy("l_id").agg(
        max_by(col("r_id"), struct(col("n_shared"), -col("r_id"))).as("r_id"),
        max(col("n_shared")).as("n_shared_max"))
  }
}
