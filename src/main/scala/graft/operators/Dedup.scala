package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines (builder-prompt first-class
  * surface). Five tiers, cheapest first:
  *
  *  1. exact           — hash groupBy on content (or md5 fingerprint)
  *  2. ngram-jaccard   — exact set similarity for candidate pairs
  *  3. MinHash + LSH   — shingle → minhash signature → banded buckets → verify
  *  4. SimHash         — 64-bit signed-projection fingerprint, hamming radius
  *  5. embedding-cosine — semantic near-dup over vector columns (see Similarity)
  *
  * Scale posture: no driver collects; candidates come from equi-join-able bucket
  * keys (LSH bands / simhash bands), never O(n²) cross joins. All hashing is
  * xxhash64 (codegen'd).
  */
object Dedup {

  /** Exact dedup (hash-groupBy): one representative (min id) per identical key. */
  def exact(df: DataFrame, id: Column, key: Column): DataFrame =
    df.groupBy(key.as("_key"))
      .agg(min(id).as("rep_id"), count(lit(1)).as("n_copies"))
      .drop("_key")

  /** Character k-shingles (distinct), whitespace-normalized lowercase. */
  def shingles(text: Column, k: Int): Column = {
    val norm = regexp_replace(trim(lower(text)), "\\s+", " ")
    array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
      i => norm.substr(i, lit(k))))
  }

  /** MinHash signature: for seed s, min over shingles of xxhash64(shingle, s). */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(shingleCol, sh => xxhash64(sh, s))))

  /** LSH band keys: one row per band; band hash = xxhash64 over the band slice. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, array_join(
        transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), x => x.cast("string")), "_")))

  /** Exact Jaccard over two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Full MinHash+LSH near-dup pipeline:
    * shingle → signature → band buckets → candidate pairs (equi-join on
    * (band, bucket), id1 < id2, deduped) → verify exact jaccard ≥ threshold →
    * representative = min neighbor id (single-pass star-merge; run
    * Iterate.fixpoint over it for full transitive closure).
    *
    * Returns (id, rep_id, is_dup). */
  def minhashLsh(df: DataFrame, id: Column, text: Column,
      k: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val base = df.select(id.as("id"), shingles(text, k).as("_sh"))
      .withColumn("_sig", minhashSignature(col("_sh"), numHashes))
      .withColumn("_bands", bandKeys(col("_sig"), bands, rowsPerBand))

    val bucketed = base.select(col("id"), col("_sh"),
        posexplode(col("_bands")).as(Seq("_band", "_bucket")))

    val l = bucketed.select(col("_band"), col("_bucket"),
      col("id").as("id1"), col("_sh").as("_sh1"))
    val r = bucketed.select(col("_band"), col("_bucket"),
      col("id").as("id2"), col("_sh").as("_sh2"))
    val candidates = l.join(r, Seq("_band", "_bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2", "_sh1", "_sh2")
      .dropDuplicates("id1", "id2")

    val dupPairs = candidates
      .filter(jaccard(col("_sh1"), col("_sh2")) >= threshold)
      .select("id1", "id2")

    // star-merge: every doc points at the smallest duplicate neighbor (or itself)
    val neighborMin = dupPairs.select(col("id2").as("id"), col("id1").as("_nb"))
      .unionByName(dupPairs.select(col("id1").as("id"), col("id2").as("_nb")))
      .groupBy("id").agg(min(col("_nb")).as("_minNb"))

    base.select(col("id"))
      .join(neighborMin, Seq("id"), "left_outer")
      .withColumn("rep_id", least(coalesce(col("_minNb"), col("id")), col("id")))
      .withColumn("is_dup", col("rep_id") =!= col("id"))
      .select("id", "rep_id", "is_dup")
  }

  /** 64-bit SimHash over word tokens, represented as a 64-char bitstring:
    * bit i is the sign of Σ_tokens ±1 where the sign is bit i of
    * xxhash64(token). One HOF fold over tokens carrying a 64-counter array —
    * the expression tree stays O(1) regardless of signature width (an unrolled
    * per-bit version explodes the plan and stalls codegen). */
  def simhash(text: Column): Column = {
    val hashes = transform(TextOps.wordTokens(text), t => xxhash64(t))
    val counts = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => {
        // two's-complement 64-char binary → ±1 per bit position
        val bits = transform(split(lpad(bin(h), 64, "0"), ""),
          ch => when(ch === "1", lit(1L)).otherwise(lit(-1L)))
        zip_with(acc, slice(bits, 1, 64), (a, b) => a + b)
      })
    array_join(transform(counts, c => when(c > 0, lit("1")).otherwise(lit("0"))), "")
  }

  /** Hamming distance between two equal-length bitstrings. */
  def hammingDist(a: Column, b: Column): Column =
    size(filter(zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y), p => p)).cast("long")

  /** SimHash near-dup candidates: split the 64-bit fingerprint into `bands`
    * 16-bit band keys — two docs within hamming distance (bands−1) share ≥1 band
    * (pigeonhole). Returns verified pairs with hamming ≤ maxDist. */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
      maxDist: Int = 3, bands: Int = 4): DataFrame = {
    val width = 64 / bands
    val withSig = df.select(id.as("id"), simhash(text).as("_sig"))
    val bandExprs = (0 until bands).map(b => substring(col("_sig"), b * width + 1, width))
    val banded = withSig.select(col("id"), col("_sig"),
      posexplode(array(bandExprs: _*)).as(Seq("_band", "_key")))
    val l = banded.select(col("_band"), col("_key"), col("id").as("id1"), col("_sig").as("_s1"))
    val r = banded.select(col("_band"), col("_key"), col("id").as("id2"), col("_sig").as("_s2"))
    l.join(r, Seq("_band", "_key"))
      .filter(col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .filter(hammingDist(col("_s1"), col("_s2")) <= maxDist)
      .select(col("id1"), col("id2"), hammingDist(col("_s1"), col("_s2")).as("hamming"))
  }
}
