package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.CrossHash

/** Training-data preparation operators (builder-prompt first-class surface):
  * the steps between "deduped corpus" and "tokenized shards" that every
  * large-scale LLM data pipeline runs. All rowwise ops are codegen'd
  * expressions; the only shuffle is sequence packing's per-shard sort.
  */
object TrainPrep {

  /** Deterministic dataset split: every row lands in exactly one named split,
    * decided by a cross-engine hash of its key — stable under reruns,
    * repartitioning, and incremental appends (the property that matters at
    * 100 TB: yesterday's train doc never migrates into today's test set).
    *
    * `splits` are (name, weight) pairs; the key hashes onto [0, Σweights) via
    * md5 (CrossHash — bit-reproducible in the DuckDB oracle). No shuffle:
    * purely rowwise. */
  def splitByHash(df: DataFrame, key: Column,
      splits: Seq[(String, Int)] = Seq("train" -> 98, "val" -> 1, "test" -> 1)): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "weights must be positive")
    val total = splits.map(_._2).sum
    val slot = pmod(CrossHash.md5Long(key), lit(total.toLong))
    val bounds = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val expr = splits.zip(bounds).foldRight(lit(splits.last._1)) {
      case (((name, _), ub), rest) => when(slot < ub, lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Sequence packing, concat-then-chunk style: documents are laid end-to-end
    * in (instance, order) order and cut into fixed `budget`-token context
    * windows — the standard way LLM training fills sequences without padding.
    * Returns per-doc (pack_id, offset_in_pack, n_tokens): pack_id = which
    * window the document STARTS in; a document may straddle into the next.
    *
    * `instance` shards the packing (one sort per shard — never a global
    * single-partition window; at scale use a date/source/bucket column).
    * Offsets use an exclusive running sum (codegen'd window agg with partial
    * combine). */
  def packSequences(df: DataFrame, instance: Column, order: Column,
      nTokens: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    val w = Window.partitionBy(instance).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = coalesce(sum(nTokens).over(w), lit(0L))
    df.withColumn("_off", off)
      .withColumn("pack_id", floor(col("_off") / budget))
      .withColumn("offset_in_pack", col("_off") % budget)
      .withColumn("n_tokens", nTokens.cast("long"))
      .drop("_off")
  }

  /** Materialized fixed-length context windows — the trainer-facing twin of
    * [[packSequences]]: documents' token-id arrays are laid end-to-end per
    * `instance` shard and cut into exact `budget`-length windows, documents
    * straddling window boundaries as the concat-then-chunk recipe demands.
    * Returns (instance, pack_id, token_ids, n) with n = budget everywhere
    * except each shard's final partial window. This is what gets written to
    * parquet for a data loader.
    *
    * Shape: one running-sum window per shard for offsets (the packSequences
    * agg), one posexplode to (token, global position) rows — linear in total
    * tokens, the unavoidable cost of materializing windows — and one
    * per-(shard, window) sorted reassembly agg. No global sort: every stage
    * is keyed by the shard. */
  def packTokenWindows(df: DataFrame, instance: Column, order: Column,
      tokenIds: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    val w = Window.partitionBy(col("_inst")).orderBy(col("_ord"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOff = df.select(instance.as("_inst"), order.as("_ord"),
        tokenIds.as("_ids"))
      .withColumn("_off", coalesce(sum(size(col("_ids"))).over(w), lit(0L)))
    withOff
      .select(col("_inst"), posexplode(col("_ids")).as(Seq("_i", "_tok")),
        col("_off"))
      .withColumn("_pos", col("_off") + col("_i"))
      .withColumn("pack_id", floor(col("_pos") / budget))
      .groupBy(col("_inst").as("instance"), col("pack_id"))
      .agg(
        transform(array_sort(collect_list(struct(col("_pos"), col("_tok")))),
          e => e("_tok")).as("token_ids"))
      .withColumn("n", size(col("token_ids")).cast("long"))
  }

  /** Email / phone-number patterns shared verbatim with the oracle generator —
    * RE2-safe subset (no lookaround/backrefs), so Java and DuckDB agree. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9][0-9 ()-]{6,}[0-9]"

  /** PII redaction: replace emails / international-format phone numbers with
    * placeholder tokens and report per-row match counts (the audit trail a
    * compliance pass needs). Purely rowwise regex — codegen'd, no shuffle. */
  def piiRedact(text: Column): (Column, Column, Column) = {
    val emails = size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long")
    val phones0 = regexp_replace(text, EmailRe, "<EMAIL>")
    val phoneCnt = size(regexp_extract_all(phones0, lit(PhoneRe), lit(0))).cast("long")
    val redacted = regexp_replace(phones0, PhoneRe, "<PHONE>")
    (redacted, emails, phoneCnt)
  }

  /** (id, pos, hash) of every k-token window of `text` — the shared primitive
    * under substring-level dedup and decontamination. Tokenization (lower →
    * whitespace split → drop empties) runs as codegen'd Spark SQL; window
    * assembly + md5-64 hashing runs in a mapPartitions kernel (expression HOFs
    * are CodegenFallback-interpreted — same lesson as the minhash gram kernel).
    * `pos` is the 1-based index of the window's first token. One narrow
    * 20-byte row per window, fully distributed, no shuffle here. */
  def tokenWindowHashes(df: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val sess = df.sparkSession
    import sess.implicits._
    val toks = filter(split(lower(text), "\\s+"), x => x =!= "")
    df.select(id.cast("long").as("id"), toks.as("_ts"))
      .as[(Long, Seq[String])].mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (docId, ts) =>
          val n = if (ts == null) 0 else ts.length
          (0 to n - k).iterator.map { i =>
            val g = ts.slice(i, i + k).mkString(" ")
            md.reset()
            val d = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            (docId, i + 1, java.nio.ByteBuffer.wrap(d, 0, 8).getLong)
          }
        }
      }.toDF("id", "pos", "_h")
  }

  /** Substring-level duplication signal (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better": exact duplicated token spans, here at
    * window granularity): per document, how many of its k-token windows occur
    * ≥2 times anywhere in the corpus (including elsewhere in the same doc).
    *
    * Returns every input doc: (doc_id, n_windows, n_dup_windows). Shape at
    * scale: window hashes → groupBy(hash) count (map-side combine) → equi-join
    * back → groupBy(doc). No all-pairs, no broadcast of anything unbounded. */
  def duplicateSpans(df: DataFrame, id: Column, text: Column, k: Int = 8): DataFrame = {
    val wh = tokenWindowHashes(df, id, text, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = wh.groupBy("_h").agg(count(lit(1)).as("_n"))
    val perDoc = wh.join(counts, "_h")
      .groupBy("id").agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("_n") >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
    df.select(id.cast("long").as("doc_id"))
      .join(perDoc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
  }

  /** Benchmark decontamination (GPT-3-style n-gram overlap): corpus documents
    * sharing at least one k-token window with the eval set, with overlap
    * detail. Returns (doc_id, n_hit_windows = distinct contaminated positions,
    * n_eval_docs = distinct eval docs hit).
    *
    * Shape at scale: both sides reduce to (hash) keys; the eval side is
    * distinct-ed and is normally small enough that AQE broadcasts it — the
    * corpus side never shuffles more than one row per window. */
  def decontaminate(corpus: DataFrame, corpusId: Column, corpusText: Column,
      eval: DataFrame, evalId: Column, evalText: Column, k: Int = 8): DataFrame = {
    val cg = tokenWindowHashes(corpus, corpusId, corpusText, k)
    val eg = tokenWindowHashes(eval, evalId, evalText, k)
      .select(col("id").as("_eid"), col("_h")).distinct()
    cg.join(eg, "_h")
      .groupBy(col("id").as("doc_id"))
      .agg(countDistinct(col("pos")).as("n_hit_windows"),
        countDistinct(col("_eid")).as("n_eval_docs"))
  }

  /** FUZZY benchmark decontamination — the graded variant of
    * [[decontaminate]]: instead of flagging ANY shared k-token window (the
    * GPT-3 rule), score each (corpus doc, eval doc) candidate pair by the
    * exact Jaccard of their k-token-window hash SETS and flag pairs at or
    * above `threshold` (the n-gram-overlap decontamination used by
    * Dolma/LLaMA-style cleanups, where partial paraphrase overlap matters).
    *
    * Scale shape (the minhash verify discipline): candidates come from the
    * shared-window equi-join — never corpus × eval — and the per-doc hash
    * sets ship only for candidate pairs. Eval sets are benchmark-sized
    * (thousands of docs), so the candidate side is bounded by genuine
    * overlap. Hashes are the md5 window family, so the DuckDB oracle
    * replays sets, intersections and the Jaccard division bit-exactly. */
  def decontaminateFuzzy(corpus: DataFrame, corpusId: Column, corpusText: Column,
      eval: DataFrame, evalId: Column, evalText: Column,
      k: Int = 8, threshold: Double = 0.5): DataFrame = {
    val cg = tokenWindowHashes(corpus, corpusId, corpusText, k)
    val eg = tokenWindowHashes(eval, evalId, evalText, k)
    val cset = cg.groupBy("id").agg(collect_set(col("_h")).as("_hs"))
    val eset = eg.groupBy(col("id").as("_eid"))
      .agg(collect_set(col("_h")).as("_ehs"))
    val cand = cg.join(eg.select(col("id").as("_eid"), col("_h")), "_h")
      .select(col("id"), col("_eid")).distinct()
    val inter = size(array_intersect(col("_hs"), col("_ehs")))
    cand.join(cset, "id").join(eset, "_eid")
      .withColumn("jaccard", inter.cast("double") /
        (size(col("_hs")) + size(col("_ehs")) - inter).cast("double"))
      .select(col("id").as("doc_id"), col("_eid").as("eval_id"),
        col("jaccard"), (col("jaccard") >= threshold).as("contaminated"))
  }

  /** Deterministic per-group cap — the per-SOURCE document budget of a
    * corpus mixture build (cap an over-represented crawl at N docs while
    * small sources keep everything). Selection order is the cross-engine
    * md5 hash of `key` (hash order ≈ random order, unbiased; stable under
    * reruns and repartitioning), ties → smaller key, so the kept set is
    * exactly reproducible by the DuckDB oracle.
    *
    * HOT-GROUP-SAFE plan shape: the operator's own use case guarantees a
    * dominant group (that is what you cap), so a single
    * `row_number over (partition by group)` would funnel the whole hot
    * source through one task's sort. Hot groups instead go through
    * distributed THRESHOLD SELECTION — find the n-th smallest (h, key) by
    * histogram refinement, then rank only the boundary sliver:
    *   1. one map-side-combined count per group; groups over `hotThreshold`
    *      rows form a broadcastable hot list (pigeonhole: ≤ N/hotThreshold
    *      groups, ~250k at 10^12 rows with the 4M default). Cold groups
    *      take the plain per-group window (≤ hotThreshold rows per task).
    *   2. histogram hot rows by the top 10 bits of h (`h >> 54` is
    *      monotone in signed h, so buckets are RANGES of the selection
    *      order); a per-group running sum over ≤1024 cells locates the
    *      bucket where the cumulative count crosses n. Rows in lower
    *      buckets are kept outright by a broadcast-joined filter — the hot
    *      group's data is never shuffled, only its count cells are.
    *   3. repeat once inside the boundary bucket with the next 10 bits
    *      (`(h >> 44) & 1023`, monotone within a fixed `h >> 54` prefix):
    *      the surviving sliver is ~count/2^20 rows (≈1M at a 10^12-row
    *      group), and only IT takes the exact per-group (h, key) rank.
    * The kept set is bit-identical to the single-window form: bucket
    * boundaries are monotone in h (equal h values always share a bucket,
    * so ties resolve inside the final exact rank), and every n up to the
    * group size is in-regime — no parameter coupling between n and a task
    * budget. The one remaining single-task tail is pathological key
    * duplication (> ~budget rows sharing one 20-bit h prefix means that
    * many DUPLICATE keys, since md5 spreads distinct keys).
    *
    * `hotThreshold = Long.MaxValue` opts out of the scaffolding entirely
    * (no extra count pass) — the right choice for inputs known small. */
  def capPerGroup(df: DataFrame, key: Column, group: Column, n: Int,
      hotThreshold: Long = 1L << 22): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val h = CrossHash.md5Long(key)
    val rkPlain = row_number().over(W.partitionBy(group).orderBy(h.asc, key.asc))
    val P = "_graft_cap_" // reserved internals: collision-checked, all dropped
    require(!df.columns.exists(_.toLowerCase.startsWith(P)),
      s"capPerGroup reserves the column-name prefix '$P'")
    // cap 0 = keep nothing; the hot path's boundary search has no bucket
    // where the cumulative count crosses 0, which would pass every hot row
    if (n <= 0) return df.limit(0)
    if (hotThreshold == Long.MaxValue)
      return df.withColumn(s"${P}rk", rkPlain)
        .filter(col(s"${P}rk") <= n).drop(s"${P}rk")
    val outCols = df.columns.toSeq.map(col)
    // The tiny frames (hot list, boundary buckets) are eagerly
    // localCheckpoint'ed: they appear under every union branch below, and
    // without pinning, each branch would recompute their full-corpus
    // aggregation subtrees (exchange reuse helps but is plan-shape
    // fragile). Pinned, the result is exactly 7 corpus scans for any n and
    // any group skew — and the branches provably select from ONE
    // materialization of each boundary (df itself is still scanned per
    // branch: like every multi-pass operator here, df must be
    // deterministic under rescan).
    def pin(d: DataFrame): DataFrame = broadcast(Materialize.eager(d))
    // 1. hot list (tiny by pigeonhole) broadcast back as a tag
    val hot = pin(df.groupBy(group.as(s"${P}g"))
      .agg(count(lit(1)).as(s"${P}cnt"))
      .filter(col(s"${P}cnt") > hotThreshold)
      .select(col(s"${P}g"), lit(true).as(s"${P}hot")))
    // No hot group: every group fits under hotThreshold, so the plain
    // per-group window is already bounded (≤ hotThreshold rows per task) —
    // skip the 4-branch scaffolding and its extra corpus scans. `hot` is
    // materialized by pin() at this point, so the emptiness check is free.
    if (hot.isEmpty)
      return df.withColumn(s"${P}rk", rkPlain)
        .filter(col(s"${P}rk") <= n).drop(s"${P}rk")
    val tagged = df.join(hot, group <=> col(s"${P}g"), "left_outer")
    val cold = tagged.filter(col(s"${P}hot").isNull)
      .withColumn(s"${P}rk", rkPlain).filter(col(s"${P}rk") <= n)
      .select(outCols: _*)
    val hotRows = tagged.filter(col(s"${P}hot").isNotNull)
      .withColumn(s"${P}h", h)
      .withColumn(s"${P}b1", shiftright(col(s"${P}h"), 54))
      .withColumn(s"${P}b2", shiftright(col(s"${P}h"), 44).bitwiseAND(lit(1023L)))
    // 2. level-1 boundary: the h>>54 range bucket where the per-group
    // cumulative count crosses n (none when the whole group fits under n)
    val cells1 = hotRows.groupBy(col(s"${P}g"), col(s"${P}b1"))
      .agg(count(lit(1)).as(s"${P}c"))
      .withColumn(s"${P}cum", sum(col(s"${P}c")).over(
        W.partitionBy(col(s"${P}g")).orderBy(col(s"${P}b1").asc)))
    val bd1 = pin(cells1
      .filter(col(s"${P}cum") - col(s"${P}c") < n && col(s"${P}cum") >= n)
      .select(col(s"${P}g").as(s"${P}g1"), col(s"${P}b1").as(s"${P}bb1"),
        (col(s"${P}cum") - col(s"${P}c")).as(s"${P}below1")))
    val j1 = hotRows.join(bd1, col(s"${P}g") <=> col(s"${P}g1"), "left_outer")
    val keep1 = j1.filter(col(s"${P}bb1").isNull || col(s"${P}b1") < col(s"${P}bb1"))
      .select(outCols: _*)
    val ref1 = j1.filter(col(s"${P}b1") === col(s"${P}bb1"))
    // 3. level-2 boundary inside the level-1 bucket, then the exact rank
    // over only the final sliver (~count/2^20 rows per group)
    val cells2 = ref1.groupBy(col(s"${P}g"), col(s"${P}b2"))
      .agg(count(lit(1)).as(s"${P}c"), min(col(s"${P}below1")).as(s"${P}bl"))
      .withColumn(s"${P}cum", sum(col(s"${P}c")).over(
        W.partitionBy(col(s"${P}g")).orderBy(col(s"${P}b2").asc)))
    val bd2 = pin(cells2
      .filter(col(s"${P}cum") - col(s"${P}c") < lit(n) - col(s"${P}bl") &&
        col(s"${P}cum") >= lit(n) - col(s"${P}bl"))
      .select(col(s"${P}g").as(s"${P}g2"), col(s"${P}b2").as(s"${P}bb2"),
        (col(s"${P}bl") + col(s"${P}cum") - col(s"${P}c")).as(s"${P}below2")))
    val j2 = ref1.join(bd2, col(s"${P}g") <=> col(s"${P}g2"), "inner")
    val keep2 = j2.filter(col(s"${P}b2") < col(s"${P}bb2")).select(outCols: _*)
    val keep3 = j2.filter(col(s"${P}b2") === col(s"${P}bb2"))
      .withColumn(s"${P}rk", row_number().over(
        W.partitionBy(col(s"${P}g")).orderBy(col(s"${P}h").asc, key.asc)))
      .filter(col(s"${P}rk") <= lit(n) - col(s"${P}below2"))
      .select(outCols: _*)
    cold.unionByName(keep1).unionByName(keep2).unionByName(keep3)
  }

  /** Deterministic weighted sampling: keep a row iff
    * pmod(md5(key), resolution) < floor(p · resolution) — i.e. with
    * probability p, but decided by a cross-engine hash of the key, so the
    * sample is stable under reruns, repartitioning, and appends, and the
    * accept/reject decision is exactly reproducible in the DuckDB oracle.
    * `p` is any per-row Column in [0, 1] (e.g. TextOps.qualityScore). */
  def sampleByWeight(df: DataFrame, key: Column, p: Column,
      resolution: Long = 1000000L): DataFrame =
    df.filter(pmod(CrossHash.md5Long(key), lit(resolution)) <
      floor(p * resolution.toDouble).cast("long"))

  /** Deterministic STRATIFIED sampling toward a target mixture — the
    * data-mixing step of a pre-training corpus build (per-source sampling
    * weights à la GPT-3 Table 2.2 / The Pile's mixture table). `rates` is a
    * two-column (group, p) table of per-stratum keep probabilities;
    * mixture tables are dims-small by construction, so it broadcast-joins
    * onto the corpus — no shuffle of the big side, and the accept test stays
    * a codegen'd filter. Groups absent from `rates` take `defaultP` (0 =
    * drop unlisted strata). Acceptance reuses [[sampleByWeight]]'s
    * cross-engine hash-slot rule on `key`, so samples are stable under
    * reruns, repartitioning and appends, nested as rates grow, and exactly
    * replayable in the DuckDB oracle. */
  def sampleStratified(df: DataFrame, key: Column, group: Column,
      rates: DataFrame, defaultP: Double = 0.0,
      resolution: Long = 1000000L): DataFrame = {
    val rateCols = rates.columns
    require(rateCols.length == 2, s"rates must be (group, p), got ${rateCols.mkString(",")}")
    val r = broadcast(rates.select(col(rateCols(0)).as("_g"),
      col(rateCols(1)).cast("double").as("_p")))
    df.join(r, group === col("_g"), "left_outer")
      .filter(pmod(CrossHash.md5Long(key), lit(resolution)) <
        floor(coalesce(col("_p"), lit(defaultP)) * resolution.toDouble).cast("long"))
      .drop("_g", "_p")
  }

  /** Embedding-space DIVERSITY quota sampling — the coverage companion of
    * SemDeDup (Abbas et al. 2023 §5 keeps spread-out representatives; the
    * DiverseEvol/coreset line does the same with an explicit quota): cluster
    * the embedding space (SRP-LSH buckets → spherical k-means assignment,
    * [[Clustering.viaLsh]]) and keep at most `cap` members per cluster, so
    * the kept subset covers every discovered region instead of
    * oversampling dense ones. Selection inside a cluster is the
    * deterministic hash-rank rule ([[capPerGroup]] — md5(id) order):
    * rerun/append-stable, exactly replayable in the DuckDB oracle, and
    * hot-cluster-safe at scale (the two-level histogram boundary plan caps
    * any single window task). Returns the kept (id, label) rows. */
  def diversitySample(points: DataFrame, id: Column, vec: Column, dim: Int,
      k: Int, cap: Int, nPlanes: Int = 4, nTables: Int = 4,
      lloydIters: Int = 2, hotThreshold: Long = 1L << 22): DataFrame = {
    // capPerGroup scans its input at least twice (hot-group probe + the rank
    // pass); viaLsh's assignment is MATERIALIZED by contract (r21 — a
    // localCheckpoint, not a leaked persist, closing the r20 verdict #2 /
    // advice leak), so both scans read the checkpointed rows and nothing is
    // left pinned after the call.
    val labeled = Clustering.viaLsh(points, id, vec, dim, k, nPlanes, nTables, lloydIters)
    capPerGroup(labeled, col("id"), col("label"), cap, hotThreshold)
  }

  // ── DSIR: data selection via importance resampling (Xie et al. 2023) ───────
  //
  // Select raw-corpus documents that LOOK LIKE a target domain: fit hashed
  // n-gram (unigram+bigram) bag models over the target and raw corpora,
  // weight each raw doc by its log importance ratio, and take the top
  // (or gumbel-resample). The standard public data-selection recipe for
  // pre-training mixture construction.
  //
  // 100 TB shape: one explode+count per corpus with map-side combine, a
  // `buckets`-row ratio table broadcast onto the per-doc counts, and ONE
  // groupBy(id) shuffle. Never corpus x corpus; the only driver scalars are
  // the two corpus gram totals (same two-pass contract as any TF-IDF build,
  // TextOps.bm25PerTerm). Log-ratios quantize to integer micro-units before
  // the per-doc sum, so weights are exact integers — order-independent
  // across partitionings and bit-reproducible in the DuckDB oracle (the
  // bm25_per_term 6-dp LN pin, then integer arithmetic the rest of the way).

  /** Nonempty whitespace tokens of the lowercased text — the oracle-pinned
    * tokenization every TrainPrep op shares. */
  def whitespaceTokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Whitespace word count on [[whitespaceTokens]] — the token-inventory
    * column the mixture planner and selection pipelines feed on. */
  def whitespaceWordCount(text: Column): Column =
    size(whitespaceTokens(text)).cast("long")

  /** Per-doc hashed n-gram bucket counts: (id, bucket, cnt). Tokens are
    * nonempty whitespace runs of the lowercased text (the oracle-pinned
    * shape); grams are tokens plus adjacent-pair bigrams; `buckets` must be
    * a power of two so the oracle's unsigned `% buckets` equals this signed
    * `pmod` bit-for-bit (same requirement as LinearModel's feature hash). */
  def hashedNgramCounts(df: DataFrame, id: Column, text: Column,
      buckets: Int): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets=$buckets must be a power of two")
    val toks = whitespaceTokens(text)
    val bigrams = when(size(toks) >= 2,
      zip_with(slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b))).otherwise(array())
    df.select(id.as("id"), explode(concat(toks, bigrams)).as("gram"))
      .select(col("id"), pmod(CrossHash.md5Long(col("gram")), lit(buckets.toLong)).as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Laplace-smoothed log importance ratios per hash bucket, in integer
    * micro-units: round(1e6 * (ln p_target(b) − ln p_raw(b))). One row per
    * bucket (absent buckets included at count 0), small enough to broadcast
    * at any corpus size.
    *
    * Size `buckets` at or below the expected DISTINCT-gram count: with
    * buckets >> grams the smoothing mass dominates both models and every
    * absolute weight goes negative (top-k RANKING is unaffected, but
    * absolute thresholds invert — a doubled target-flavored doc scores 2x
    * worse instead of 2x better). The 8192 default fits the >= 100k-gram
    * corpora this is built for; shrink it for toy fixtures. */
  def dsirLogRatios(raw: DataFrame, target: DataFrame, id: Column, text: Column,
      buckets: Int): DataFrame = {
    val spark = raw.sparkSession
    val tc = hashedNgramCounts(target, id, text, buckets)
      .groupBy("bucket").agg(sum("cnt").as("t"))
    val rc = hashedNgramCounts(raw, id, text, buckets)
      .groupBy("bucket").agg(sum("cnt").as("r"))
    // the corpus gram totals ride along as broadcast 1-row cross joins
    // (the mixture_plan T* pattern) — NO driver-scalar actions, so the
    // whole ratio table is ONE declarative plan and the bucket-aggregate
    // exchanges feed both their total and their join consumer
    val tTot = broadcast(tc.agg(coalesce(sum("t"), lit(0L)).as("_tt")))
    val rTot = broadcast(rc.agg(coalesce(sum("r"), lit(0L)).as("_rt")))
    spark.range(buckets).select(col("id").as("bucket"))
      .join(tc, Seq("bucket"), "left_outer")
      .join(rc, Seq("bucket"), "left_outer")
      .crossJoin(tTot).crossJoin(rTot)
      .select(col("bucket"),
        round((log((coalesce(col("t"), lit(0L)) + lit(1.0)) /
                   (col("_tt").cast("double") + lit(buckets.toDouble))) -
               log((coalesce(col("r"), lit(0L)) + lit(1.0)) /
                   (col("_rt").cast("double") + lit(buckets.toDouble)))) * lit(1e6), 0)
          .cast("long").as("lr_micro"))
  }

  /** Score docs against a PRE-BUILT ratio table: Σ_grams cnt·lr_micro —
    * an exact integer. Freezing the ratios is the INCREMENTAL form: under
    * persisted reruns a grown corpus re-scores only its new docs' grams and
    * every retained doc keeps a bit-identical weight, so the changelog is
    * the true diff (recomputing ratios per run shifts every weight — full
    * churn). */
  def dsirScore(raw: DataFrame, ratios: DataFrame, id: Column, text: Column,
      buckets: Int = 8192): DataFrame =
    hashedNgramCounts(raw, id, text, buckets)
      .join(broadcast(ratios), "bucket")
      .groupBy("id").agg(sum(col("cnt") * col("lr_micro")).as("logw_micro"))

  /** Per-raw-doc DSIR log importance weight in micro-units (one-shot form:
    * ratios fitted on this raw corpus and target, then scored). */
  def dsirWeights(raw: DataFrame, target: DataFrame, id: Column, text: Column,
      buckets: Int = 8192): DataFrame =
    dsirScore(raw, dsirLogRatios(raw, target, id, text, buckets), id, text, buckets)

  /** Top-k raw docs by importance weight (ties broken by id): the
    * deterministic selection head. Output (id, logw_micro, rank). */
  def dsirSelect(raw: DataFrame, target: DataFrame, id: Column, text: Column,
      buckets: Int = 8192, k: Int = 100): DataFrame = {
    val w = dsirWeights(raw, target, id, text, buckets)
      .orderBy(col("logw_micro").desc, col("id").asc).limit(k)
    w.withColumn("rank", row_number().over(
        Window.orderBy(col("logw_micro").desc, col("id").asc)).cast("long"))
  }

  /** Gumbel-top-k importance RESAMPLING (the paper's sampling head): key =
    * logw/temperature + Gumbel(u) with u a cross-engine hash of the id, so
    * the sample is without-replacement ∝ exp(logw/T), yet deterministic and
    * stable under reruns/repartitioning — same hash-slot philosophy as
    * [[sampleByWeight]]. */
  def dsirResample(raw: DataFrame, target: DataFrame, id: Column, text: Column,
      buckets: Int = 8192, k: Int = 100, temperature: Double = 1.0,
      resolution: Long = 1 << 30): DataFrame = {
    val w = dsirWeights(raw, target, id, text, buckets)
    val u = (pmod(CrossHash.md5Long(col("id")), lit(resolution)) + lit(0.5)) /
      lit(resolution.toDouble)
    w.withColumn("key",
        col("logw_micro") / lit(1e6 * temperature) - log(-log(u)))
      .orderBy(col("key").desc, col("id").asc).limit(k)
  }

  // ── Mixture planning: per-source token budgets for a target mix ────────────
  //
  // The data-mixing arithmetic of a pre-training corpus build: sources have
  // token inventories and an epoch cap (how many times a source may repeat);
  // the recipe has target proportions. [[mixturePlanStrict]] answers "how
  // large can the corpus be if the mixture is honored EXACTLY" (the scarcest
  // source binds); [[mixturePlanFilled]] answers "given a token budget, how
  // much comes from each source when saturated sources' overflow
  // redistributes to the rest" (renormalizing waterfill). Output rates feed
  // [[sampleStratified]] directly.
  //
  // Planning runs on one G-row frame (G = #sources, dims-small by
  // construction — the sampleStratified contract); the only corpus-sized
  // work is the groupBy(source) token count. Every float op in the strict
  // plan is an IEEE-exact  / * min floor chain, so the plan is
  // bit-reproducible in the DuckDB oracle with no rounding-tie risk.

  /** Exact-mixture plan: largest total T with sel_g = w_g·T ≤ cap_g, i.e.
    * T* = min_g cap_g/w_g. `targets` is a (group, weight) table (weights
    * should sum to 1). Output per source: tokens, cap, selected,
    * rate_micro (floor(1e6·selected/tokens), the sampleStratified rate in
    * micro-units), saturated (this source binds T*). */
  def mixturePlanStrict(df: DataFrame, group: Column, tokens: Column,
      targets: DataFrame, maxEpochs: Double = 1.0): DataFrame = {
    val tCols = targets.columns
    require(tCols.length == 2, s"targets must be (group, weight), got ${tCols.mkString(",")}")
    val counts = df.groupBy(group.as("src")).agg(sum(tokens).as("tokens"))
    val j = counts.join(
      broadcast(targets.select(col(tCols(0)).as("src"),
        col(tCols(1)).cast("double").as("w"))), "src")
      .withColumn("cap", col("tokens") * lit(maxEpochs))
    val tstar = j.agg(min(col("cap") / col("w")).as("tstar"))
    j.crossJoin(broadcast(tstar))
      .select(col("src"), col("tokens"),
        floor(col("cap")).cast("long").as("cap"),
        floor(col("w") * col("tstar")).cast("long").as("selected"),
        floor(lit(1e6) * col("w") * col("tstar") / col("tokens"))
          .cast("long").as("rate_micro"),
        (col("cap") / col("w") === col("tstar")).as("saturated"))
  }

  /** Budgeted waterfill: spend `budget` tokens at proportions `targets`,
    * letting each source give at most cap_g = tokens_g·maxEpochs; a
    * saturated source's unmet share redistributes proportionally among the
    * rest (at most G rounds). Planning happens on the collected G-row
    * mixture table (dims-small by construction). */
  def mixturePlanFilled(df: DataFrame, group: Column, tokens: Column,
      targets: DataFrame, budget: Double, maxEpochs: Double = 1.0): DataFrame = {
    val spark = df.sparkSession
    val tCols = targets.columns
    require(tCols.length == 2, s"targets must be (group, weight), got ${tCols.mkString(",")}")
    val rows = df.groupBy(group.as("src")).agg(sum(tokens).as("tokens"))
      .join(broadcast(targets.select(col(tCols(0)).as("src"),
        col(tCols(1)).cast("double").as("w"))), "src")
      .collect()
      .map(r => (r.get(0), r.getLong(1), r.getLong(1) * maxEpochs, r.getDouble(2)))
    var remaining = budget
    var active = rows.map { case (s, _, cap, w) => (s, cap, w) }
    val sel = scala.collection.mutable.Map[Any, Double]()
    rows.foreach { case (s, _, _, _) => sel(s) = 0.0 }
    var done = false
    while (!done && remaining > 1e-9 && active.nonEmpty) {
      val wSum = active.map(_._3).sum
      if (wSum <= 0) done = true
      else {
        // groups that saturate at this round's proportional allocation
        val sat = active.filter { case (s, cap, w) =>
          sel(s) + remaining * (w / wSum) >= cap - 1e-9 }
        if (sat.isEmpty) {
          active.foreach { case (s, _, w) => sel(s) += remaining * (w / wSum) }
          remaining = 0.0
        } else {
          sat.foreach { case (s, cap, _) => remaining -= (cap - sel(s)); sel(s) = cap }
          active = active.filterNot { case (s, _, _) => sat.exists(_._1 == s) }
        }
      }
    }
    import scala.jdk.CollectionConverters._
    // SAME column order as mixturePlanStrict — the two planner heads are
    // drop-in siblings for positional consumers
    val out = rows.map { case (s, t, cap, _) =>
      // rate_micro = keep fraction of the source inventory (can exceed 1e6
      // when maxEpochs > 1 — i.e. "repeat this source"), feeds
      // sampleStratified (p = rate_micro/1e6) for single-epoch plans
      org.apache.spark.sql.Row(s, t, math.floor(cap).toLong,
        math.floor(sel(s)).toLong,
        math.floor(1e6 * sel(s) / t).toLong, sel(s) >= cap - 1e-9)
    }.toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("src",
        rows.headOption.map(r => org.apache.spark.sql.catalyst.expressions.Literal(r._1).dataType)
          .getOrElse(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.types.StructField("tokens", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cap", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("selected", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rate_micro", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("saturated", org.apache.spark.sql.types.BooleanType)))
    spark.createDataFrame(out.asJava, schema)
  }
}
