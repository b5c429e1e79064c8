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
}
