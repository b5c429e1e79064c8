package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for the chrono-format datetime surface
  * ([[ChronoFormat]]) and the python-semantics numeric round. All are plain
  * binary expressions with `doGenCode` emitting a static JVM call, so they
  * stay inside whole-stage codegen (no UDF/CodegenFallback tax on a corpus
  * scan). Formats arriving from a COLUMN (reference
  * test_strftime_with_format_in_column) hit the per-format compile cache in
  * [[ChronoFormat]].
  */
private[graft] case class ChronoStrftime(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType == TimestampNTZType || left.dataType == TimestampType) &&
        right.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"chrono_strftime requires (timestamp[_ntz], string), got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = StringType
  /** timestamp (ltz) children carry a UTC instant → %z/%Z render; ntz is the
    * reference's DateTimeNaive → those directives error (time.rs:219). */
  private def isUtc: Boolean = left.dataType == TimestampType
  override def nullSafeEval(ts: Any, fmt: Any): Any =
    UTF8String.fromString(ChronoFormat.strftimeMicros(
      ts.asInstanceOf[Long], fmt.asInstanceOf[UTF8String].toString, isUtc))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ts, fmt) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.ChronoFormat.strftimeMicros($ts, $fmt.toString(), $isUtc));""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ChronoStrftime =
    copy(left = l, right = r)
}

/** strptime: `zoned=false` → DateTimeNaive (timestamp_ntz, with the
  * reference's datetime→date→time-on-1900-01-01 fallback chain);
  * `zoned=true` → DateTimeUtc (timestamp, offset required). Parse failures
  * throw with the reference's exact `parse error: …` message. */
private[graft] case class ChronoStrptime(left: Expression, right: Expression, zoned: Boolean)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"chrono_strptime requires (string, string), got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = if (zoned) TimestampType else TimestampNTZType
  override def nullSafeEval(s: Any, fmt: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    val f = fmt.asInstanceOf[UTF8String].toString
    if (zoned) ChronoFormat.strptimeUtcMicros(str, f)
    else ChronoFormat.strptimeNaiveMicros(str, f)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (zoned) "strptimeUtcMicros" else "strptimeNaiveMicros"
    nullSafeCodeGen(ctx, ev, (s, fmt) =>
      s"${ev.value} = graft.functions.ChronoFormat.$fn($s.toString(), $fmt.toString());")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ChronoStrptime =
    copy(left = l, right = r)
}

/** DateTimeNaive.to_utc(timezone) with the reference's gap/fold rules
  * (time.rs:558): fold → later instant, gap → `(t+30min)` rounded to the
  * nearest hour then localized. Spark's `to_utc_timestamp` resolves folds to
  * the EARLIER instant and shifts gap times by the gap length — silently
  * different on every DST transition (pinned by test_date_time_naive_to_utc).
  */
private[graft] case class ToUtcTz(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == TimestampNTZType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"to_utc_tz requires (timestamp_ntz, string), got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = TimestampType
  override def nullSafeEval(ts: Any, tz: Any): Any =
    ChronoFormat.toUtcMicros(ts.asInstanceOf[Long], tz.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ts, tz) =>
      s"${ev.value} = graft.functions.ChronoFormat.toUtcMicros($ts, $tz.toString());")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ToUtcTz =
    copy(left = l, right = r)
}

/** Python-builtin `round(x, n)` semantics for `num.round` (the reference
  * lowers it to exactly that callback, internals/expressions/numerical.py:121)
  * — half-to-even on the EXACT binary value of the double. Spark's `round` is
  * half-up and `bround` rounds the shortest decimal REPRESENTATION
  * (`BigDecimal.valueOf`), so e.g. bround(2.675, 2) = 2.68 where python (and
  * this expression) give 2.67. */
private[graft] case class PyRound(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"py_round requires (double, int), got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any, d: Any): Any =
    PyRound.round(v.asInstanceOf[Double], d.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, d) =>
      s"${ev.value} = graft.functions.PyRound.round($v, $d);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PyRound =
    copy(left = l, right = r)
}

object PyRound {
  def round(v: Double, decimals: Int): Double =
    if (v.isNaN || v.isInfinite) v
    else new java.math.BigDecimal(v)
      .setScale(decimals, java.math.RoundingMode.HALF_EVEN).doubleValue()
}
