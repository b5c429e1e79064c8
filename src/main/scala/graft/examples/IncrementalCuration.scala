package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Persistence

/** Incremental (persisted-rerun) curation — the reference's persistence
  * workflow (tests/test_persistence.py shape) on a corpus pipeline: a
  * batch job runs on a schedule over a growing corpus, and every run
  * emits ONLY the changelog of curated rows — new docs that pass the
  * quality gates as `diff=+1`, previously-emitted docs whose status
  * changed (e.g. a later duplicate arrived and displaced them) as
  * `diff=-1` — so downstream consumers (index builders, trainers)
  * process deltas, never the full corpus.
  *
  * Each run:
  *   1. recompute the curated view over the full current corpus
  *      (declarative — Catalyst plans it; the exact-dedup keep-min-id rule
  *      makes the view deterministic under growth),
  *   2. `Persistence.runStatic` commits it as the next parquet generation
  *      and returns the distributed unit-diff vs the previous generation
  *      (one count-aggregate shuffle — ScaleProbe: 6M rows diffed in
  *      ~1.6 s on local[32]).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 runMain
  *      graft.examples.IncrementalCuration
  */
object IncrementalCuration {

  /** The curated view: quality-gated, exact-deduped (min doc_id wins —
    * deterministic under corpus growth, so a later-arriving smaller-id
    * duplicate DISPLACES the old representative and the changelog shows
    * the retraction + replacement). */
  def curatedView(docs: DataFrame): DataFrame = {
    val kept = docs
      .filter(graft.operators.TextOps.qualityScore(col("text")) > 0.3)
    graft.operators.Dedup.exact(kept, col("doc_id"), col("text"))
  }

  /** One scheduled run: curate the current corpus, emit the changelog. */
  def runOnce(stateDir: String, corpus: DataFrame): DataFrame =
    Persistence.runStatic(stateDir, curatedView(corpus))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val state = java.nio.file.Files.createTempDirectory("graft-inc-curation").toString

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")

    // run 1: first half of the corpus "arrived"
    val firstHalf = docs.filter(col("doc_id") % 2 === 0)
    val d1 = runOnce(state, firstHalf)
    println(s"run 1: ${d1.count()} changelog rows (all +1)")

    // run 2: the rest arrives, plus exact duplicates of some run-1 docs
    // under SMALLER ids — those displace the old representatives, so the
    // changelog carries their retractions alongside the new insertions
    val dupes = firstHalf.limit(20)
      .select((col("doc_id") - 1000000L).as("doc_id"), col("text"))
    val corpus2 = docs.unionByName(dupes)
    val d2 = runOnce(state, corpus2)
    val byDiff = d2.groupBy("diff").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    println(s"run 2: +${byDiff.getOrElse(1, 0L)} / -${byDiff.getOrElse(-1, 0L)} changelog rows")

    // run 3: nothing changed — the changelog is empty
    val d3 = runOnce(state, corpus2)
    println(s"run 3 (no-op): ${d3.count()} changelog rows")
    spark.stop()
  }
}
