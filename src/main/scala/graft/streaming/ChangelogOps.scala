package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation over changelogs — the retraction algebra (SURVEY known-hard
  * #1). The reference flows diff=−1 through every reducer (reduce.rs
  * SemigroupState retract path; concepts.md:234 "diff column"); Spark has no
  * native retraction flow, but the algebra is expressible relationally:
  *
  *  - LINEAR reducers (sum, count, avg) aggregate diff-weighted values:
  *    sum → Σ v·diff, count → Σ diff — one map-side-combining pass.
  *  - ORDER reducers (min, max) need the live multiset: group by
  *    (key, value) summing diffs, keep multiplicity > 0, then min/max —
  *    two passes, both shuffle-by-key, exact under any insert/retract
  *    history (the reference keeps the same per-value multiplicity state).
  *
  * Both shapes scale: no state beyond the aggregation itself, and the live
  * multiset is bounded by distinct (key, value) pairs.
  */
object ChangelogOps {

  /** Linear aggregates of a changelog: per key, net count / sum / avg of
    * `value` under insertions (diff=+1) and retractions (diff=−1). Rows
    * whose net count is zero (fully retracted keys) are dropped. */
  def netAggregate(changelog: DataFrame, keyCols: Seq[String], value: Column,
      diff: Column): DataFrame =
    changelog.groupBy(keyCols.map(col): _*)
      .agg(sum(diff).cast("long").as("net_count"),
        sum(value * diff).as("net_sum"))
      .filter(col("net_count") > 0)
      .withColumn("net_avg", col("net_sum") / col("net_count"))

  /** Changelog × changelog equi-join — the bilinear rule of differential
    * dataflow: an output row exists per (left event, right event) pair with
    * diff = diff_l · diff_r, so retractions on either side retract exactly
    * the pairs they created (join_tables dataflow.rs:2720 does the same via
    * arrangements). Result is itself a changelog (`diff` column). */
  def joinChangelogs(left: DataFrame, right: DataFrame, on: Seq[String],
      leftDiff: Column, rightDiff: Column): DataFrame =
    left.withColumn("_dl", leftDiff)
      .join(right.withColumn("_dr", rightDiff), on)
      .withColumn("diff", col("_dl") * col("_dr"))
      .drop("_dl", "_dr")

  /** The live relation of a changelog: rows whose net multiplicity is
    * positive, with that multiplicity (Pathway's "current snapshot"). */
  def liveRows(changelog: DataFrame, cols: Seq[String], diff: Column): DataFrame =
    changelog.groupBy(cols.map(col): _*)
      .agg(sum(diff).cast("long").as("multiplicity"))
      .filter(col("multiplicity") > 0)

  /** Exact min/max over the LIVE multiset of a changelog: values whose net
    * multiplicity is positive. Handles retract-then-reinsert histories that
    * break naive min tracking. */
  def liveMinMax(changelog: DataFrame, keyCols: Seq[String], value: Column,
      diff: Column): DataFrame =
    changelog.groupBy(keyCols.map(col) :+ value.as("_v"): _*)
      .agg(sum(diff).as("_mult"))
      .filter(col("_mult") > 0)
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("_v")).as("live_min"), max(col("_v")).as("live_max"))
}
