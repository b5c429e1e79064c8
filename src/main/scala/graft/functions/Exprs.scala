package graft.functions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Pathway's scalar expression surface (SURVEY §2.3) as Spark Column combinators.
  * Everything here lowers to built-in, codegen'd Catalyst expressions — the reference
  * routes much of this (the whole `str.*` namespace, e.g. internals/expressions/
  * string.py:64) through interpreted Python callbacks; on Spark these are native.
  */
object Exprs {

  // ── conditionals (internals/common.py) ──────────────────────────────────────
  /** pw.if_else (common.py:328). */
  def ifElse(cond: Column, ifTrue: Column, ifFalse: Column): Column =
    when(cond, ifTrue).otherwise(ifFalse)

  /** pw.coalesce (common.py:277). */
  def coalesceAll(cols: Column*): Column = coalesce(cols: _*)

  /** pw.require (common.py:302): value if all args non-null else null. */
  def require(value: Column, required: Column*): Column =
    when(required.map(_.isNotNull).reduce(_ && _), value)

  /** pw.unwrap (common.py:399): assert non-null (errors the row otherwise). */
  def unwrap(c: Column): Column =
    when(c.isNotNull, c).otherwise(raise_error(lit("unwrap: got null")))

  /** pw.fill_error (common.py:438): with try_* upstream, errors surface as null. */
  def fillError(c: Column, fallback: Column): Column = coalesce(c, fallback)

  // ── containers (expression.rs:124-125, common.py:361) ──────────────────────
  def makeTuple(cols: Column*): Column = struct(cols: _*)

  /** MatMul (`@`) for 1-D numeric arrays: the dot product as a native
    * codegen'd kernel (expression.rs:134 MatMul; same left-to-right fold as
    * the HOF form it replaced). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftExprBridge
    GraftExprBridge.column(graft.functions.DotProduct(
      GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
  }

  /** Reshape a flat numeric array into `rows` rows of `cols` (row-major) —
    * the 2-D ndarray is `array<array<double>>`. */
  def reshape(vec: Column, rows: Int, cols: Int): Column =
    transform(sequence(lit(0), lit(rows - 1)),
      r => slice(vec, r * cols + 1, lit(cols)))

  /** 2-D transpose. */
  def transpose2d(m: Column): Column =
    transform(sequence(lit(1), size(element_at(m, 1))),
      j => transform(m, row => element_at(row, j)))

  /** MatMul for 2-D ndarrays (expression.rs:134 — full matrix case):
    * result[i][j] = Σ_k a[i][k]·b[k][j], folds left-to-right in k so the
    * value is bit-reproducible by the oracle. Runs as a native kernel
    * ([[graft.functions.MatMul2d]], r20): the HOF chain it replaces
    * re-evaluated the whole `b` expression once per output cell —
    * corpus-scale linear algebra still belongs in an explode→equi-join→agg
    * plan (Linalg.blockMatmul), not an expression. */
  def matmul2d(a: Column, b: Column): Column =
    GraftExprBridge.column(graft.functions.MatMul2d(
      GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
  /** pathway `tup[i]` / `tup.get(i, default)` (r16 decode of
    * test_common.py test_sequence_get_* against expression.rs:350-389
    * get_tuple_element/get_ndarray_element): indices are 0-BASED, a
    * negative index wraps ONCE (+length), and an index still out of range
    * after the wrap is "index out of bounds" (unchecked, the engine's
    * DataError::IndexOutOfBounds) or the default (checked). Spark's
    * element_at is 1-based and nulls on overflow — both wrong here. */
  def seqGet(c: Column, i: Column): Column = {
    val idx = when(i < 0, i + size(c)).otherwise(i)
    when(c.isNull, raise_error(noneGetMsg(i)))
      .when(idx >= 0 && idx < size(c), element_at(c, (idx + 1).cast("int")))
      .otherwise(raise_error(lit("index out of bounds")))
  }
  /** checked get: out-of-range (after the one negative wrap) → default.
    * A NULL sequence still ERRORS — get_array_element on Value::None is a
    * ValueError even on the checked route (expression.rs:385), not the
    * default. */
  def seqGetChecked(c: Column, i: Column, default: Column): Column = {
    val idx = when(i < 0, i + size(c)).otherwise(i)
    when(c.isNull, raise_error(noneGetMsg(i)))
      .when(idx >= 0 && idx < size(c), element_at(c, (idx + 1).cast("int")))
      .otherwise(default)
  }
  private def noneGetMsg(i: Column): Column =
    concat(lit("Can't get element at index "), i.cast("string"), lit(" out of None"))
  /** unchecked get, reference semantics (see [[seqGet]]). */
  def get(c: Column, i: Column): Column = seqGet(c, i)
  /** checked get with a null default, reference semantics. */
  def tryGet(c: Column, i: Column): Column = seqGetChecked(c, i, lit(null))

  // ── string parsing (expression.rs:128-130) ──────────────────────────────────
  def parseInt(c: Column): Column = c.cast("long")
  def parseFloat(c: Column): Column = c.cast("double")
  def parseBool(c: Column): Column = c.cast("boolean")

  /** Implicit namespaces mirroring pathway's `col.str.*` / `col.dt.*` / `col.num.*`. */
  implicit final class PwColumn(private val c: Column) extends AnyVal {
    def str: StrOps = new StrOps(c)
    def dt: DtOps = new DtOps(c)
    def num: NumOps = new NumOps(c)
    def dur: DurOps = new DurOps(c)
    private def arith(other: Column, kind: String): Column =
      GraftExprBridge.column(PyArithOp(
        GraftExprBridge.expression(c), GraftExprBridge.expression(other), kind))
    /** `//` with the reference's semantics (expression.rs:1061/1161, r16
      * decode of tests/test_operators.py): int//int = Integer::div_floor
      * (exact on the full i64 range — the previous double-floor form lost
      * precision past 2^53), float path = floor(a/b), any mix widens to
      * double, and /0 errors with "division by zero" instead of Spark's
      * silent non-ANSI null. */
    def floorDiv(other: Column): Column = arith(other, "floordiv")
    /** python `%`: floor-mod — the DIVISOR's sign (Integer::mod_floor /
      * CPython float_mod; Spark's `%` keeps the dividend's sign). */
    def pyMod(other: Column): Column = arith(other, "mod")
    /** python `/`: always float, /0 errors like the reference. */
    def pyDiv(other: Column): Column = arith(other, "truediv")
    /** int ** int: i64 wrapping pow (expression.rs:1077 `l.pow(r as u32)`) —
      * Spark's double `pow` loses exactness past 2^53. */
    def intPow(other: Column): Column =
      GraftExprBridge.column(PyIntPow(
        GraftExprBridge.expression(c.cast("long")),
        GraftExprBridge.expression(other.cast("long"))))
    /** `**` type-routed like the reference: two integral operands → the i64
      * wrapping pow (IntExpression::Pow — exact past 2^53 where double pow
      * is not), anything with a float → powf (FloatExpression::Pow). */
    def **(other: Column): Column = arith(other, "pow")
    /** pw.cast(bool, x): python truthiness — "" / 0 / 0.0 are false,
      * EVERYTHING else (incl. "False") is true ([[PyCastBool]]). */
    def castBoolPy: Column =
      GraftExprBridge.column(PyCastBool(GraftExprBridge.expression(c)))
    /** `<<` / `>>` (expression.rs:1078: Rust i64 shifts = JVM longs). */
    def <<(other: Column): Column =
      call_function("shiftleft", c.cast("long"), other.cast("int"))
    def >>(other: Column): Column =
      call_function("shiftright", c.cast("long"), other.cast("int"))
  }

  /** `str.*` namespace (internals/expressions/string.py:33-872) — all native. */
  final class StrOps(private val c: Column) extends AnyVal {
    /** `str * int` — python repetition: a negative count is the EMPTY
      * string (expression.rs:1274-1279; r16 decode of test_string_mul,
      * both operand orders). */
    def mul(n: Column): Column =
      when(n < 0, lit("")).otherwise(call_function("repeat", c, n.cast("int")))
    def lower: Column = org.apache.spark.sql.functions.lower(c)
    def upper: Column = org.apache.spark.sql.functions.upper(c)
    def reversed: Column = reverse(c)
    def len: Column = length(c).cast("long")
    def replaceAll(pat: Column, rep: Column): Column =
      org.apache.spark.sql.functions.replace(c, pat, rep)
    def startswith(p: Column): Column = c.startsWith(p)
    def endswith(p: Column): Column = c.endsWith(p)
    def swapcase: Column = {
      // no built-in; compose: translate via upper/lower char classes
      val up = org.apache.spark.sql.functions.upper(c)
      val lo = org.apache.spark.sql.functions.lower(c)
      // per-char swap: upper where original was lower, else lower
      // regexp trick is costlier; use UDF-free zip over split? Keep simple expr:
      // swapcase(s) = translate of each char — implemented via transform on chars
      array_join(transform(split(c, ""),
        ch => when(ch === org.apache.spark.sql.functions.lower(ch),
                   org.apache.spark.sql.functions.upper(ch))
              .otherwise(org.apache.spark.sql.functions.lower(ch))), "")
    }
    /** str.strip([chars]) — python semantics: no argument strips whitespace,
      * an argument is a SET of characters (string.py:396 lowers to
      * `str.strip`). */
    def strip: Column = trim(c)
    def strip(chars: String): Column = trim(c, chars)
    def title: Column = initcap(org.apache.spark.sql.functions.lower(c))

    // python slice-notation [start, end) clamping shared by count/find/rfind
    // (string.py:473/526/580 lower to str.count/str.find/str.rfind verbatim)
    private def clampIdx(idx: Column, len: Column): Column =
      least(greatest(when(idx < 0, len + idx).otherwise(idx), lit(0)), len)
    private def bounds(start: Column, end: Column): (Column, Column) = {
      val len = length(c)
      (clampIdx(coalesce(start, lit(0)), len), clampIdx(coalesce(end, len), len))
    }
    private def sliceBy(s: Column, e: Column): Column =
      c.substr(s + 1, greatest(e - s, lit(0)))

    /** str.count(sub, start, end): non-overlapping occurrences in the
      * [start, end) slice; an empty sub counts len+1 like python. */
    def count(sub: Column, start: Column = lit(null), end: Column = lit(null)): Column = {
      val (s, e) = bounds(start, end)
      val sl = sliceBy(s, e)
      // empty sub: python returns 0 when the RAW start exceeds the length or
      // the slice is inverted (stringlib ADJUST_INDICES), else sliceLen+1
      when(length(sub) === 0,
        when(coalesce(start, lit(0)) > length(c) || e < s, lit(0L))
          .otherwise((e - s + 1).cast("long")))
      .otherwise(((length(sl) -
        length(org.apache.spark.sql.functions.replace(sl, sub, lit("")))) / length(sub))
        .cast("long"))
    }
    /** str.find(sub, start, end): lowest ABSOLUTE index, −1 if absent. */
    def find(sub: Column, start: Column = lit(null), end: Column = lit(null)): Column = {
      val (s, e) = bounds(start, end)
      val pos = instr(sliceBy(s, e), sub.cast("string"))
      when(length(sub) === 0,
        when(coalesce(start, lit(0)) > length(c) || e < s, lit(-1L))
          .otherwise(s.cast("long")))
      .otherwise(when(pos === 0, lit(-1L)).otherwise((s + pos - 1).cast("long")))
    }
    /** str.rfind(sub, start, end): highest ABSOLUTE index, −1 if absent —
      * found by locating the reversed sub in the reversed slice. */
    def rfind(sub: Column, start: Column = lit(null), end: Column = lit(null)): Column = {
      val (s, e) = bounds(start, end)
      val sl = sliceBy(s, e)
      val pos = instr(reverse(sl), reverse(sub.cast("string")))
      when(length(sub) === 0,
        when(coalesce(start, lit(0)) > length(c) || e < s, lit(-1L))
          .otherwise(e.cast("long")))
      .otherwise(when(pos === 0, lit(-1L))
        .otherwise((s + (length(sl) - (pos - 1) - length(sub))).cast("long")))
    }
    def removeprefix(p: Column): Column =
      when(c.startsWith(p), c.substr(length(p) + 1, length(c))).otherwise(c)
    def removesuffix(s: Column): Column =
      when(c.endsWith(s), c.substr(lit(1), length(c) - length(s))).otherwise(c)
    /** python-style [start, end) slice, 0-based. */
    def slice(start: Int, end: Int): Column = c.substr(lit(start + 1), lit(end - start))

    // str.parse_int/parse_float/parse_bool (expression.rs:719/731/743:
    // trim, then Rust parse; optional=true → None, else ParseError with the
    // reference's message). Spark's string→long CAST truncates "10.5" to 10,
    // which the reference rejects — hence the integral-shape guard.
    def parseInt: Column = parseInt(optional = true)
    def parseInt(optional: Boolean): Column = {
      val t = trim(c)
      val ok = t.rlike("^[+-]?[0-9]+$")
      val parsed = when(ok, t.cast("long"))
      if (optional) parsed
      else coalesce(parsed, when(c.isNull, lit(null).cast("long")).otherwise(
        raise_error(concat(lit("cannot parse \""), c, lit("\" to int"))).cast("long")))
    }
    def parseFloat: Column = parseFloat(optional = true)
    def parseFloat(optional: Boolean): Column = {
      val parsed = trim(c).cast("double")
      if (optional) parsed
      else coalesce(parsed, when(c.isNull, lit(null).cast("double")).otherwise(
        raise_error(concat(lit("cannot parse \""), c, lit("\" to float"))).cast("double")))
    }
    /** parse_bool with the reference's default true/false vocabularies
      * (string.py:869) — lowercase-trimmed membership; unmatched → None
      * (optional) or the reference error. */
    def parseBool: Column = parseBool(optional = true)
    def parseBool(optional: Boolean): Column =
      parseBool(StrOps.DefaultTrue, StrOps.DefaultFalse, optional)
    def parseBool(trueValues: Seq[String], falseValues: Seq[String], optional: Boolean): Column = {
      val lc = org.apache.spark.sql.functions.lower(trim(c))
      val base = when(lc.isin(trueValues.map(_.toLowerCase): _*), lit(true))
        .when(lc.isin(falseValues.map(_.toLowerCase): _*), lit(false))
      if (optional) base.otherwise(lit(null).cast("boolean"))
      else base.otherwise(when(c.isNull, lit(null).cast("boolean")).otherwise(
        raise_error(concat(lit("cannot parse \""), c, lit("\" to bool"))).cast("boolean")))
    }
    def splitBy(sep: String): Column =
      org.apache.spark.sql.functions.split(c, java.util.regex.Pattern.quote(sep))
  }

  object StrOps {
    /** Reference defaults (string.py:869-870). */
    val DefaultTrue: Seq[String] = Seq("on", "true", "yes", "1")
    val DefaultFalse: Seq[String] = Seq("off", "false", "no", "0")
  }

  /** `dt.*` namespace (internals/expressions/date_time.py:41-1605).
    * Timestamps are µs-precision Spark timestamps; durations are Long nanoseconds
    * (SURVEY §1.4 — preserves the reference's ns arithmetic in aggregable form). */
  final class DtOps(private val c: Column) extends AnyVal {
    def nanosecond: Column = (date_format(c, "SSSSSS").cast("long") * 1000L)
    def microsecond: Column = date_format(c, "SSSSSS").cast("long")
    def millisecond: Column = (date_format(c, "SSSSSS").cast("long") / 1000L).cast("long")
    def second: Column = org.apache.spark.sql.functions.second(c).cast("long")
    def minute: Column = org.apache.spark.sql.functions.minute(c).cast("long")
    def hour: Column = org.apache.spark.sql.functions.hour(c).cast("long")
    def day: Column = dayofmonth(c).cast("long")
    def month: Column = org.apache.spark.sql.functions.month(c).cast("long")
    def year: Column = org.apache.spark.sql.functions.year(c).cast("long")
    /** ISO weekday 0=Mon..6=Sun (python datetime.weekday parity). */
    def weekday: Column = ((dayofweek(c) + 5) % 7).cast("long")
    /** seconds/millis/micros since epoch (NTZ interpreted in UTC session tz). */
    def timestampSec: Column = unix_seconds(c.cast("timestamp_ltz"))
    def timestampMs: Column = unix_millis(c.cast("timestamp_ltz"))
    def timestampUs: Column = unix_micros(c.cast("timestamp_ltz"))
    /** dt.timestamp(unit) (time.rs:81 timestamp_in_unit): FLOAT ns/mult —
      * the reference divides the i64 ns timestamp as f64, keeping the
      * fraction (timestamp(unit="s") of 1.5s is 1.5, not 1). */
    def timestampInUnit(unit: String): Column = {
      val mult = ChronoFormat.unitMultiplierNs(unit)
      (unix_micros(c.cast("timestamp_ltz")) * lit(1000L)).cast("double") / lit(mult.toDouble)
    }

    /** Chrono-format strftime (reference dt.strftime — %-directives, NOT
      * Java patterns; the format may come from a column). `%z/%Z` require a
      * zoned (timestamp_ltz) input, like the reference's naive/utc split
      * (time.rs:219/320). */
    def strftime(fmt: String): Column = strftime(lit(fmt))
    def strftime(fmt: Column): Column =
      GraftExprBridge.column(ChronoStrftime(
        GraftExprBridge.expression(c), GraftExprBridge.expression(fmt)))

    /** Chrono-format strptime → DateTimeNaive (timestamp_ntz), with the
      * reference's datetime→date→time-on-1900-01-01 fallback chain
      * (time.rs:152). */
    def strptime(fmt: String): Column = strptime(lit(fmt))
    def strptime(fmt: Column): Column =
      GraftExprBridge.column(ChronoStrptime(
        GraftExprBridge.expression(c), GraftExprBridge.expression(fmt), zoned = false))
    /** strptime requiring %z → DateTimeUtc (an instant; time.rs:270). */
    def strptimeUtc(fmt: String): Column = strptimeUtc(lit(fmt))
    def strptimeUtc(fmt: Column): Column =
      GraftExprBridge.column(ChronoStrptime(
        GraftExprBridge.expression(c), GraftExprBridge.expression(fmt), zoned = true))

    /** The reference's Display form (time.rs:256/360): ISO, 9-digit
      * fraction; `+0000` suffix on the zoned variant. */
    def toDisplayString: Column = strftime("%Y-%m-%dT%H:%M:%S%.9f")
    def toDisplayStringUtc: Column = strftime("%Y-%m-%dT%H:%M:%S%.9f%z")

    /** dt.from_timestamp(unit): epoch number → timestamp (date_time.py from_timestamp). */
    def fromTimestampSec: Column = timestamp_seconds(c).cast("timestamp_ntz")
    def fromTimestampMs: Column = timestamp_millis(c.cast("long")).cast("timestamp_ntz")
    def fromTimestampUs: Column = timestamp_micros(c.cast("long")).cast("timestamp_ntz")
    /** dt.from_timestamp(unit) for any reference alias (time.rs:187: value ×
      * unit multiplier, ns); sub-µs floors to the µs grid (documented ns→µs
      * mapping). */
    def fromTimestamp(unit: String): Column = {
      val mult = ChronoFormat.unitMultiplierNs(unit)
      if (mult >= 1000L)
        timestamp_micros(c.cast("long") * lit(mult / 1000L)).cast("timestamp_ntz")
      else { // ns: floor the ns count onto µs ("div" truncates, remainder pre-removed)
        val ns = c.cast("long") * lit(mult)
        timestamp_micros(call_function("div", ns - pmod(ns, lit(1000L)), lit(1000L)))
          .cast("timestamp_ntz")
      }
    }
    /** dt.utc_from_timestamp(unit): same arithmetic, zoned result. */
    def utcFromTimestamp(unit: String): Column = fromTimestamp(unit).cast("timestamp_ltz")
    def floorTo(unit: String): Column = date_trunc(unit, c).cast("timestamp_ntz")
    /** true round-to-duration (reference dt.round, date_time.py): duration in ns.
      * Integer µs arithmetic throughout — double math would lose precision on
      * post-2001 epochs (unix ns > 2^53). */
    def roundToNs(durationNs: Long): Column = {
      val us = unix_micros(c.cast("timestamp_ltz"))
      val dUs = durationNs / 1000L
      timestamp_micros(((us + lit(dUs / 2)) - pmod(us + lit(dUs / 2), lit(dUs))).cast("long"))
        .cast("timestamp_ntz")
    }
    def floorToNs(durationNs: Long): Column = {
      val us = unix_micros(c.cast("timestamp_ltz"))
      val dUs = durationNs / 1000L
      timestamp_micros((us - pmod(us, lit(dUs))).cast("long")).cast("timestamp_ntz")
    }
    /** dt.round/floor with a pandas-style offset string ("D", "2H3T",
      * "14L22ms14us" — the reference's round_to str form). Sub-µs spans are
      * identity on the µs grid; a span that is neither µs-aligned nor sub-µs
      * cannot be represented and errors. */
    def roundToOffset(spec: String): Column = offsetRound(spec, roundToNs)
    def floorToOffset(spec: String): Column = offsetRound(spec, floorToNs)
    private def offsetRound(spec: String, f: Long => Column): Column = {
      val ns = ChronoFormat.pandasOffsetNs(spec)
      if (ns < 1000L) c // µs grid: every value is already a multiple
      else {
        Predef.require(ns % 1000L == 0,
          s"offset $spec ($ns ns) is not representable on the µs grid")
        f(ns)
      }
    }

    /** DateTimeNaive.to_utc(tz) with the reference's DST rules (time.rs:558,
      * via [[ToUtcTz]]): fold → LATER instant, gap → (t+30min) rounded to the
      * nearest hour then localized. NOT Spark's to_utc_timestamp, which
      * resolves both differently on every transition. */
    def toUtc(tz: String): Column = toUtc(lit(tz))
    def toUtc(tz: Column): Column =
      GraftExprBridge.column(ToUtcTz(
        GraftExprBridge.expression(c.cast("timestamp_ntz")), GraftExprBridge.expression(tz)))
    def toNaiveInTimezone(tz: String): Column =
      from_utc_timestamp(c, tz).cast("timestamp_ntz")

    /** datetime + Duration (expression.rs:300 AddDuration; r16 decode of
      * test_operators.py test_date_time_and_duration): exact ns arithmetic
      * floored onto the µs grid (D1) — `us + floor(ns/1000)`, so adding
      * −1 ns to a grid point moves one µs back, exactly the truncation of
      * the reference's ns result. Works for naive and utc inputs (returned
      * as timestamp_ntz on the same UTC-session grid, like [[roundToNs]]). */
    def addDuration(durNs: Column): Column = {
      val us = unix_micros(c.cast("timestamp_ltz"))
      val d = durNs.cast("long")
      timestamp_micros(us +
        call_function("div", d - pmod(d, lit(1000L)), lit(1000L))).cast("timestamp_ntz")
    }
    /** datetime − Duration (expression.rs:301 SubDuration): same grid rule
      * on the negated duration. */
    def subDuration(durNs: Column): Column = addDuration(-durNs.cast("long"))
    /** datetime − datetime → Duration ns (expression.rs DateTimeNaive/Utc
      * Sub): exact on the µs grid. */
    def subDateTime(other: Column): Column =
      (unix_micros(c.cast("timestamp_ltz")) -
        unix_micros(other.cast("timestamp_ltz"))) * lit(1000L)

    /** dt.add_duration_in_timezone (date_time.py): interpret the naive time
      * in `tz`, add the duration in ABSOLUTE time, convert back to naive —
      * composition pinned by test_add_sub_in_timezone (crossing both DST
      * transitions). */
    def addDurationInTimezone(durNs: Column, tz: String): Column = {
      val utcUs = unix_micros(toUtc(tz)) + call_function("div", durNs, lit(1000L))
      timestamp_micros(utcUs).dt.toNaiveInTimezone(tz)
    }
    def subtractDurationInTimezone(durNs: Column, tz: String): Column =
      addDurationInTimezone(-durNs, tz)
    /** dt.subtract_date_time_in_timezone → Duration (Long ns). */
    def subtractDateTimeInTimezone(other: Column, tz: String): Column =
      (unix_micros(toUtc(tz)) - unix_micros(other.dt.toUtc(tz))) * lit(1000L)

    /** dt.to_duration(unit): value × unit multiplier → Duration (Long ns);
      * unit may be a column (reference alias set, time.rs:125; bad units
      * error like the reference ValueError). */
    def toDuration(unit: Column): Column =
      // when-chain derived from the single alias table in ChronoFormat; the
      // error replicates the reference's quoted ValueError text
      ChronoFormat.unitAliases.foldLeft(when(lit(false), lit(0L))) {
        case (acc, (a, mult)) => acc.when(unit === lit(a), c.cast("long") * lit(mult))
      }.otherwise(raise_error(concat(
        lit("unit has to be a valid time unit but is \""), unit, lit("\""))).cast("long"))
  }

  /** Duration accessors (time.rs:388-418: chrono num_* — integer division
    * truncating toward ZERO, pinned by test_duration's negative vectors).
    * Durations are Long nanoseconds; `div` is Catalyst IntegralDivide, which
    * truncates toward zero and stays exact on the full i64 range (a double
    * division would corrupt |ns| > 2^53). */
  final class DurOps(private val c: Column) extends AnyVal {
    private def in(unit: Long): Column = call_function("div", c, lit(unit))

    // ── Duration arithmetic (time.rs:420-528; r16 decode of
    //    tests/test_operators.py test_duration / test_duration_and_int) ──
    /** Duration × int: wrapping i64 product (time.rs:477). */
    def mulBy(n: Column): Column = c.cast("long") * n.cast("long")
    /** Duration × float: `(ns as f64 * f) as i64` — Rust `as` TRUNCATES
      * toward zero (time.rs:487); Spark's non-ANSI double→long cast is the
      * same truncate-with-saturation. */
    def mulByFloat(f: Column): Column = (c.cast("double") * f.cast("double")).cast("long")
    /** Duration / float → Duration, same truncating cast (time.rs:515). */
    def divByFloat(f: Column): Column = (c.cast("double") / f.cast("double")).cast("long")
    /** Duration // Duration → Int via div_floor (time.rs:499); /0 errors. */
    def floorDivDur(other: Column): Column = new PwColumn(c).floorDiv(other)
    /** Duration % Duration → Duration via mod_floor (time.rs:525); /0 errors. */
    def modDur(other: Column): Column = new PwColumn(c).pyMod(other)
    /** Duration // int → Duration via div_floor (time.rs:507-512). */
    def floorDivBy(n: Column): Column = new PwColumn(c).floorDiv(n.cast("long"))
    /** Duration / int → Duration: Rust `/` TRUNCATION toward zero, NOT
      * floor — truediv-by-int and floordiv-by-int genuinely differ on
      * negatives (time.rs:426 true_div_by_i64; pinned by the
      * test_duration_and_int goldens: -11ns // 3 = -4ns but -11ns / 3 =
      * -3ns); /0 errors. */
    def trueDivBy(n: Column): Column =
      GraftExprBridge.column(PyArithOp(
        GraftExprBridge.expression(c.cast("long")),
        GraftExprBridge.expression(n.cast("long")), "truncdiv"))
    /** Duration / Duration → FLOAT ratio (time.rs:420 true_div); the zero
      * check lives in the expression layer (expression.rs:1219). */
    def trueDivDur(other: Column): Column = new PwColumn(c).pyDiv(other)

    def nanoseconds: Column = c.cast("long")
    def microseconds: Column = in(1000L)
    def milliseconds: Column = in(1000000L)
    def seconds: Column = in(1000000000L)
    def minutes: Column = in(60L * 1000000000L)
    def hours: Column = in(3600L * 1000000000L)
    def days: Column = in(86400L * 1000000000L)
    def weeks: Column = in(7L * 86400L * 1000000000L)
  }

  /** `num.*` namespace (internals/expressions/numerical.py:30-144). */
  final class NumOps(private val c: Column) extends AnyVal {
    def abs: Column = org.apache.spark.sql.functions.abs(c)
    /** num.round: the reference lowers to python's builtin `round`
      * (numerical.py:121) — half-to-even on the EXACT binary value
      * ([[PyRound]]). Spark's `round` (half-up) and `bround` (half-even on
      * the shortest decimal repr) both differ on representation edges like
      * 2.675. Decimals may come from a column. */
    def round(decimals: Int): Column = round(lit(decimals))
    def round(decimals: Column): Column =
      GraftExprBridge.column(PyRound(
        GraftExprBridge.expression(c.cast("double")),
        GraftExprBridge.expression(decimals.cast("int"))))
    /** num.fill_na: None or NaN → default, INPUT TYPE KEPT (the reference's
      * int fill stays int — an `nanvl`-based form would coerce to double). */
    def fillNa(v: Column): Column =
      when(c.isNull || coalesce(isnan(c.cast("double")), lit(false)), v).otherwise(c)
  }

  // ── durations as Long ns ─────────────────────────────────────────────────────
  object Duration {
    def ns(n: Long): Long = n
    def us(n: Long): Long = n * 1000L
    def ms(n: Long): Long = n * 1000000L
    def seconds(n: Long): Long = n * 1000000000L
    def minutes(n: Long): Long = n * 60L * 1000000000L
    def hours(n: Long): Long = n * 3600L * 1000000000L
    def days(n: Long): Long = n * 86400L * 1000000000L
    def weeks(n: Long): Long = n * 7L * 86400L * 1000000000L
  }

  // ── JSON (internals/json.py; expression.rs:126-127) ─────────────────────────
  object Json {
    def getItem(c: Column, path: String): Column = get_json_object(c, s"$$.$path")
    def getInt(c: Column, path: String): Column = getItem(c, path).cast("long")
    def getFloat(c: Column, path: String): Column = getItem(c, path).cast("double")
    def getStr(c: Column, path: String): Column = getItem(c, path)
    def parse(c: Column, schemaDdl: String): Column = from_json(c, schemaDdl, Map.empty[String, String])
  }

  /** pw.Json on Spark VARIANT (r16 decode of tests/test_json.py against the
    * engine's JsonToValue, expression.rs:780): a JSON value is a variant;
    * "missing" is SQL NULL; a JSON null is a variant whose `is_variant_null`
    * holds — the distinction the reference's get/default matrix pins. The
    * string-path [[Json]] helpers above stay for lenient extraction; this
    * namespace is the reference-faithful one (STRICT `as_*`: an int is not a
    * float is not a string — serde_json as_i64/as_f64/as_bool/as_str
    * semantics, errors included). */
  object PwJson {
    def parse(c: Column): Column = parse_json(c)
    /** JSON null — NOT SQL null (pw.Json(None)). */
    def jsonNull: Column = parse_json(lit("null"))

    /** `.get(key, default)` (test_json_get_default matrix): the key's value
      * when v is an object containing it — a JSON-null VALUE passes through —
      * else `default` (arrays, scalars, JSON null, missing key, missing
      * value all take the default). */
    /** Variant path for an arbitrary object key: plain `$.key` for
      * identifier-shaped keys, bracket-quoted for everything else (the
      * parser accepts `['name']` / `["name"]` but no escapes, so pick the
      * quote the key does not contain). */
    private def keyPath(key: String): Option[String] =
      if (key.matches("[A-Za-z_][A-Za-z0-9_]*")) Some(s"$$.$key")
      else if (!key.contains("'")) Some(s"$$['$key']")
      else if (!key.contains("\"")) Some(s"""$$["$key"]""")
      else None // both quote kinds: no expressible path — map-cast fallback

    def getField(v: Column, key: String, default: Column): Column = {
      val got = keyPath(key) match {
        case Some(p) => try_variant_get(v, p, "variant")
        case None => // any key at all: object → map<string, variant> lookup
          element_at(v.cast(org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.VariantType)), lit(key))
      }
      when(got.isNotNull, got).otherwise(default)
    }
    def getField(v: Column, key: String): Column =
      getField(v, key, lit(null).cast(org.apache.spark.sql.types.VariantType))
    /** `[key]` (test_json_get_item): like get but the default is JSON null. */
    def item(v: Column, key: String): Column = getField(v, key, jsonNull)
    /** `.get(i)` / `[i]` on arrays: out-of-bounds INCLUDING negative indices
      * yields the default (the reference does NOT wrap pythonically —
      * test_json_get_array_index_out_of_bounds pins −1 → null). */
    def itemIndex(v: Column, i: Int): Column =
      if (i < 0) jsonNull
      else coalesce(try_variant_get(v, s"$$[$i]", "variant"), jsonNull)
    /** index from a column: via a variant→array cast (dynamic paths are not
      * foldable). */
    def itemIndex(v: Column, i: Column): Column = {
      val arr = v.cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.VariantType))
      coalesce(when(i >= 0 && i < size(arr), element_at(arr, i.cast("int") + 1)), jsonNull)
    }

    private def conv(v: Column, ok: Column => Column, target: String,
        typeName: String): Column =
      when(v.isNull || is_variant_null(v), lit(null).cast(target))
        .when(ok(schema_of_variant(v)), variant_get(v, "$", target))
        .otherwise(raise_error(concat(
          lit("Cannot convert json "), to_json(v), lit(s" to $typeName"))).cast(target))

    /** STRICT conversions (serde_json as_* through JsonToValue): JSON null /
      * missing → SQL null; wrong runtime type → the reference's
      * `Cannot convert json … to …` error (1.5 is not an Int, "42" is not an
      * Int, true is not an Int; ints widen to Float; nothing coerces to
      * Bool/String). */
    def asInt(v: Column): Column = conv(v, _ === "BIGINT", "long", "Int")
    def asFloat(v: Column): Column =
      conv(v, t => t === "BIGINT" || t === "DOUBLE" || t.startsWith("DECIMAL"),
        "double", "Float")
    def asStr(v: Column): Column = conv(v, _ === "STRING", "string", "String")
    def asBool(v: Column): Column = conv(v, _ === "BOOLEAN", "boolean", "Bool")

    /** Array elements for `flatten` (dataflow.rs:2274): non-arrays error with
      * the reference message. Explode the result. */
    def elements(v: Column): Column =
      when(v.isNull || !schema_of_variant(v).startsWith("ARRAY"),
        raise_error(concat(lit("Pathway can't flatten this Json: "), to_json(v)))
          .cast(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.VariantType)))
        .otherwise(v.cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.VariantType)))
  }
}
