package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator

/** Pathway's reducer set (SURVEY §2.4; reference src/engine/reduce.rs:27-45,
  * python/pathway/internals/reducers.py) as Spark aggregate Columns.
  *
  * Everything that can be composed from built-in (codegen'd, partial-aggregating)
  * functions is; custom `Aggregator`s exist only for the genuinely stateful API
  * (`stateful_single/many`, `udf_reducer` — custom_reducers.py:36/111/282), same
  * partial/final shape as the reference's SemigroupState (reduce.rs:47-53).
  */
object Reducers {

  // ── direct built-ins (reducers.py:300-675) ──────────────────────────────────
  def min_(c: Column): Column = min(c)
  def max_(c: Column): Column = max(c)
  def sum_(c: Column): Column = sum(c)
  def count_(): Column = count(lit(1))
  def countDistinct_(c: Column): Column = countDistinct(c)
  /** count_distinct_approximate(precision) (reducers.py:837, HLL in reduce.rs:30). */
  def countDistinctApprox(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)
  def avg_(c: Column): Column = avg(c)

  /** Exact continuous quantile (R-7 linear interpolation — the rule Spark's
    * `percentile` and DuckDB's `quantile_cont` share): h = (n−1)·p,
    * x⌊h⌋ + (h−⌊h⌋)·(x⌊h⌋₊₁ − x⌊h⌋). Beyond the reference's reducer set
    * (reducers.py stops at avg/sum/count); a large-scale curation pipeline
    * wants exact quartiles for length/score distributions. Exact percentile
    * is a full sort per group — for 100 TB-scale dashboards prefer
    * [[countDistinctApprox]]-style sketches (approx_percentile) unless the
    * group fits an executor; this reducer is for grading thresholds where
    * exactness is the point. */
  def quantileCont(c: Column, p: Double): Column = percentile(c, lit(p))
  /** Exact median = [[quantileCont]] at 0.5. */
  def median(c: Column): Column = percentile(c, lit(0.5))

  // ── argmin/argmax (reducers.py:406/463): deterministic via lexicographic tie-break ──
  def argmin(arg: Column, value: Column, tieBreak: Column): Column =
    min_by(arg, struct(value, tieBreak))
  def argmax(arg: Column, value: Column, tieBreak: Column): Column =
    max_by(arg, struct(value, tieBreak))

  // ── unique (reducers.py:520, reduce.rs:34): all values equal, else error ────
  def unique(c: Column): Column =
    when(min(c) <=> max(c), min(c))
      .otherwise(raise_error(lit("unique reducer: non-unique values in group")))

  /** `any` (reducers.py:551): arbitrary-but-deterministic element. The reference
    * picks by internal order; we pin the canonical minimum (documented divergence). */
  def anyDeterministic(c: Column): Column = min(c)

  // ── tuple-valued reducers (reducers.py:579/610/700) ─────────────────────────
  /** sorted_tuple(skip_nones=true): collect_list already drops nulls. */
  def sortedTuple(c: Column): Column = sort_array(collect_list(c))
  /** tuple in groupby-sort order: reducers see rows ordered by `sortKey`. */
  def tupleInOrder(sortKey: Column, v: Column): Column =
    transform(array_sort(collect_list(struct(sortKey.as("k"), v.as("v")))), x => x.getField("v"))
  /** ndarray reducer (reducers.py:700): dense vector of the group's values. */
  def ndarray(sortKey: Column, v: Column): Column = tupleInOrder(sortKey, v)

  // ── earliest / latest (reducers.py:735/769) over event time ────────────────
  // (the reference uses processing time — reduce.rs:43/44; we substitute event
  //  time + tie-break, SURVEY §7 known-hard #4)
  def earliest(v: Column, eventTime: Column, tieBreak: Column): Column =
    min_by(v, struct(eventTime, tieBreak))
  def latest(v: Column, eventTime: Column, tieBreak: Column): Column =
    max_by(v, struct(eventTime, tieBreak))

  // ── stateful reducers (custom_reducers.py:36/111) ───────────────────────────

  /** `stateful_single`: arbitrary fold, expressed as a Spark Aggregator —
    * identical partial(update)/merge(combine)/finish shape to the reference's
    * `SemigroupState` (reduce.rs:47-53), so map-side combine still applies. */
  def statefulSingle[IN, S, OUT](zeroS: S)(updateFn: (S, IN) => S)(mergeFn: (S, S) => S)(
      finishFn: S => OUT)(implicit si: Encoder[S], so: Encoder[OUT]): Aggregator[IN, S, OUT] =
    new Aggregator[IN, S, OUT] {
      override def zero: S = zeroS
      override def reduce(b: S, a: IN): S = updateFn(b, a)
      override def merge(b1: S, b2: S): S = mergeFn(b1, b2)
      override def finish(r: S): OUT = finishFn(r)
      override def bufferEncoder: Encoder[S] = si
      override def outputEncoder: Encoder[OUT] = so
    }

  /** Demo accumulator in the `BaseCustomAccumulator` style (custom_reducers.py:282):
    * exact sum of squares over a Long-convertible column. */
  object SumSqAgg extends Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Long): Long = b + a * a
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
  /** Column form of [[SumSqAgg]] usable inside agg(). */
  def sumSq(c: Column): Column = udaf(SumSqAgg).apply(c.cast("long"))
}
