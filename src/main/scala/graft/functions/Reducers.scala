package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, GraftExprBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, RuntimeReplaceable, UnaryMinus}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Overflow-safe negation for [[Reducers.argmax]]'s inverted sort key: once
  * the child resolves, integral inputs (Long/Int/Short/Byte) are widened to
  * decimal(20,0) — which holds −Long.MinValue exactly — before negating, so
  * the MinValue sentinel can no longer overflow back onto itself and
  * silently rank as the maximum. Non-integral types (double/float/decimal)
  * negate unchanged, keeping large-double exactness. Rewritten by the
  * optimizer's ReplaceExpressions rule, so the executed plan is plain
  * codegen'd Cast+UnaryMinus. */
private[graft] case class WidenedNeg(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      UnaryMinus(Cast(child, DecimalType(20, 0)), failOnError = false)
    case _ => UnaryMinus(child, failOnError = false)
  }
  override protected def withNewChildInternal(newChild: Expression): WidenedNeg =
    copy(child = newChild)
}

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
  /** count_distinct over any number of columns (reducers.py count_distinct;
    * r16 decode of test_distinct): zero columns counts the distinct empty
    * tuple — 1 for any non-empty group. */
  def countDistinct_(cols: Column*): Column =
    if (cols.isEmpty) countDistinct(lit(0))
    else countDistinct(cols.head, cols.tail: _*)
  /** count_distinct_approximate(precision) (reducers.py:837, HLL in reduce.rs:30). */
  def countDistinctApprox(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)
  /** The reference's `precision` form (2^precision HLL registers; its test
    * bound is err < 1.8/2^(p/2), test_reducers.py:658): mapped to Spark
    * HLL++'s rsd via the standard σ ≈ 1.04/√m. Multi-column inputs hash as a
    * struct, like the reference's tuple key. Zero columns = exact 1. */
  def countDistinctApproxPrecision(precision: Int, cols: Column*): Column =
    if (cols.isEmpty) countDistinct(lit(0))
    else {
      val rsd = 1.04 / math.sqrt(math.pow(2.0, precision.toDouble))
      val in = if (cols.size == 1) cols.head else struct(cols: _*)
      approx_count_distinct(in, rsd)
    }
  def avg_(c: Column): Column = avg(c)

  /** Float sum with Neumaier compensation — the reference's FloatSumState
    * (reduce.rs:210-236; r16 decode of test_float_sum_precision: BOTH strict
    * and non-strict float sums are compensated there, so ±10.1²¹ + 1 + 1
    * sums to exactly 2.0). Spark's plain `sum` keeps uncompensated partials
    * and loses the small addends on such cancellation — use [[sumFloat]]
    * where that matters; `sum_` remains the uncompensated performance
    * default (documented, SEMANTICS.md). Same update/merge shape as the
    * reference's plus_equals, so map-side combine applies. */
  /** Null handling matches Spark `sum` with ONE aggregate: each input row
    * arrives as (value-or-0, isNotNull); the buffer's own count tracks valid
    * rows and `finish` returns NULL (boxed) for an empty/all-null group. */
  def sumFloat(c: Column): Column = {
    val d = c.cast("double")
    udaf(FloatSumAgg).apply(coalesce(d, lit(0.0)), d.isNotNull)
  }

  object FloatSumAgg
      extends Aggregator[(Double, Boolean), (Long, Double, Double), java.lang.Double] {
    // (sum', comp') after adding v to (sum, comp) — reduce.rs:210
    private def step(sum: Double, comp: Double, v: Double): (Double, Double) = {
      val t = sum + v
      val dc = if (math.abs(sum) > math.abs(v)) (sum - t) + v else (v - t) + sum
      (t, comp + dc)
    }
    override def zero: (Long, Double, Double) = (0L, 0.0, 0.0)
    override def reduce(b: (Long, Double, Double), a: (Double, Boolean)): (Long, Double, Double) =
      if (!a._2) b // SQL-null input row: skipped, like Spark sum
      else {
        val (s, comp) = step(b._2, b._3, a._1)
        (b._1 + 1, s, comp)
      }
    override def merge(b1: (Long, Double, Double), b2: (Long, Double, Double)): (Long, Double, Double) = {
      val (s, comp) = step(b1._2, b1._3 + b2._3, b2._2)
      (b1._1 + b2._1, s, comp)
    }
    override def finish(r: (Long, Double, Double)): java.lang.Double =
      if (r._1 == 0L) null else java.lang.Double.valueOf(r._2 + r._3)
    override def bufferEncoder: Encoder[(Long, Double, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

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

  // ── argmin/argmax (reducers.py:406/463; tie rules reduce.rs:469/504) ──
  /** argmin: lexicographic min of (value, tieBreak) — exactly the
    * reference's ArgMinState replacement rule `(value, key) > (rhs)`. */
  def argmin(arg: Column, value: Column, tieBreak: Column): Column =
    min_by(arg, struct(value, tieBreak))
  /** argmax: max `value`, and a value tie resolves to the SMALLEST
    * tieBreak — the reference keeps max by `(value, Reverse(key))`
    * (reduce.rs:504; pinned by test_argmin_argmax_different_column, where
    * argmax(age, name) over an age tie returns the alphabetically FIRST
    * name). Implemented as min over an inverted sort key, so `value` must
    * be numeric — callers with time values pass the epoch number
    * (r15 decode: the previous max-tieBreak tie diverged). Ordering
    * guards (a bare `-value` would invert them): NULL values never win
    * unless the whole group is null, and NaN counts as the LARGEST value
    * — both what `max_by` did and what the reference's total value order
    * does. Integral inputs are widened to decimal(20,0) before negation
    * ([[WidenedNeg]] dispatches on the resolved type), so an integral
    * MinValue sentinel (whose bare negation overflows back onto itself
    * under non-ANSI mode) ranks correctly; doubles negate unchanged,
    * keeping large-double exactness. */
  def argmax(arg: Column, value: Column, tieBreak: Column): Column =
    min_by(arg, struct(value.isNull,
      not(coalesce(isnan(value.cast("double")), lit(false))),
      GraftExprBridge.column(WidenedNeg(GraftExprBridge.expression(value))), tieBreak))

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
  /** sorted_tuple(skip_nones=false): nulls are KEPT and sort FIRST — the
    * reference's None orders below every value (test_tuple_reducer vector
    * `(None, -1, 1)`). Null-bearing rows survive collect_list inside a
    * struct wrapper. */
  def sortedTupleKeepNones(c: Column): Column =
    transform(sort_array(collect_list(struct(c.as("v")))), x => x.getField("v"))
  /** tuple in groupby-sort order: reducers see rows ordered by `sortKey`.
    * Null values are kept in place (reference tuple(skip_nones=False));
    * compose with [[tupleInOrderSkipNones]] to drop them. */
  def tupleInOrder(sortKey: Column, v: Column): Column =
    transform(array_sort(collect_list(struct(sortKey.as("k"), v.as("v")))), x => x.getField("v"))
  /** tuple(skip_nones=true): row order kept, null values dropped. */
  def tupleInOrderSkipNones(sortKey: Column, v: Column): Column =
    filter(tupleInOrder(sortKey, v), x => x.isNotNull)
  /** ndarray reducer (reducers.py:700): dense vector of the group's values. */
  def ndarray(sortKey: Column, v: Column): Column = tupleInOrder(sortKey, v)

  /** Order-sensitive custom reducer — the reference's
    * `udf_reducer(Accumulator)` with a `sort_by` row key
    * (custom_reducers.py; r16 decode of test_custom_sorting): rows reach the
    * fold sorted by `sortKey` regardless of arrival/partition order. `init`
    * builds the accumulator from the FIRST row (reference `from_row`), and
    * `step` folds each later row in (`update`). Collects the group into an
    * array first — the price of order-sensitivity under parallel input, the
    * same materialize-then-sort the reference's sorting path performs. */
  def foldInOrder(sortKey: Column, row: Column)(init: Column => Column)(
      step: (Column, Column) => Column): Column = {
    val arr = transform(
      array_sort(collect_list(struct(sortKey.as("k"), row.as("v")))), x => x.getField("v"))
    aggregate(slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
      init(element_at(arr, 1)), step)
  }

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

  /** Misra-Gries heavy-hitter sketch: a MERGEABLE bounded-state frequency
    * summary of at most `capacity` (value, weight) counters per group
    * (Agarwal et al. 2013 "Mergeable Summaries" §3). Update: increment a
    * tracked value, else fill a free slot, else decrement ALL counters (drop
    * zeros). Merge: pointwise sum, then subtract the (capacity+1)-largest
    * weight from every counter and drop ≤0 — the summary-preserving trim.
    *
    * Guarantee (order- and partitioning-independent): every value with true
    * frequency > n/(capacity+1) is among the survivors, and each counter
    * undercounts by at most n/(capacity+1). The candidate SET itself depends
    * on encounter order — assert the coverage guarantee, not the set.
    * State is O(capacity) regardless of distinct-value cardinality — the
    * scale path when the exact (group, value) count shuffle
    * (Utils.topKFrequent) is itself too wide. */
  final class MisraGriesAgg(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (b.contains(a)) b.updated(a, b(a) + 1L)
      else if (b.size < capacity) b.updated(a, 1L)
      else b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val sum = (b1.keySet ++ b2.keySet).iterator
        .map(k => k -> (b1.getOrElse(k, 0L) + b2.getOrElse(k, 0L))).toMap
      if (sum.size <= capacity) sum
      else {
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
        sum.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
      }
    }
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: map<value, estimated weight> per group. */
  def misraGries(c: Column, capacity: Int): Column =
    udaf(new MisraGriesAgg(capacity)).apply(c.cast("string"))

  /** Count-Min sketch (Cormode & Muthukrishnan 2005): a depth×width array
    * of counters; value v increments cell (r, floorMod(mix_r(md5(v)),
    * width)) in every row r; the frequency estimate is the MIN over rows of
    * v's cells. Always an OVERestimate (est ≥ true count), within εn of
    * truth with probability 1−δ at width = e/ε, depth = ln(1/δ).
    *
    * Unlike Misra-Gries, every cell is an order-independent SUM — the
    * sketch is bit-identical under any partitioning/merge order AND exactly
    * replayable by the DuckDB oracle (same md5+mix hash family as minhash).
    * State is O(depth·width) Longs per group regardless of distinct-value
    * cardinality; merge = elementwise add (a true mergeable summary). Use
    * over [[MisraGriesAgg]] when you need point-frequency QUERIES against
    * the summary rather than a heavy-hitter candidate set. */
  final class CountMinAgg(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Seq[Long]] {
    require(depth > 0 && depth <= 16 && width > 0)
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], v: String): Array[Long] = {
      val h = graft.functions.CrossHash.md5LongJvm(v)
      var r = 0
      while (r < depth) {
        val (a, c) = graft.functions.CrossHash.mixers(r)
        b(r * width + math.floorMod(h * a + c, width.toLong).toInt) += 1L
        r += 1
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: the flattened depth×width cell array per group. */
  def countMin(c: Column, depth: Int, width: Int): Column =
    udaf(new CountMinAgg(depth, width)).apply(c.cast("string"))

  /** Point-frequency estimate of `v` from a [[countMin]] sketch column —
    * min over rows of v's cells, as a codegen'd expression (the mix chain
    * is the same md5Long family the sketch used). */
  def countMinEstimate(sketch: Column, v: Column, depth: Int, width: Int): Column = {
    val h = graft.functions.CrossHash.md5Long(v.cast("string"))
    (0 until depth).map { r =>
      element_at(sketch,
        (lit(r * width) + pmod(graft.functions.CrossHash.mix(h, r), lit(width.toLong))
          .cast("int") + 1).cast("int"))
    }.reduceLeft(least(_, _))
  }
}
