package graft.functions

import org.apache.spark.sql.Column
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
    * value is bit-reproducible by the oracle. HOFs are interpreted — right
    * for the reference's per-row small-matrix semantics (feature transforms);
    * corpus-scale linear algebra belongs in an explode→equi-join→agg plan,
    * not an expression. */
  def matmul2d(a: Column, b: Column): Column =
    transform(a, row =>
      transform(sequence(lit(1), size(element_at(b, 1))), j =>
        aggregate(zip_with(row, b, (x, brow) => x.cast("double") * element_at(brow, j)),
          lit(0.0), (acc, v) => acc + v)))
  /** checked get → null on missing (GetExpression, expression.py:1090). */
  def tryGet(c: Column, i: Column): Column = try_element_at(c, i)
  def get(c: Column, i: Column): Column = element_at(c, i)

  // ── string parsing (expression.rs:128-130) ──────────────────────────────────
  def parseInt(c: Column): Column = c.cast("long")
  def parseFloat(c: Column): Column = c.cast("double")
  def parseBool(c: Column): Column = c.cast("boolean")

  /** Implicit namespaces mirroring pathway's `col.str.*` / `col.dt.*` / `col.num.*`. */
  implicit final class PwColumn(private val c: Column) extends AnyVal {
    def str: StrOps = new StrOps(c)
    def dt: DtOps = new DtOps(c)
    def num: NumOps = new NumOps(c)
    /** integer floor-division `//` (expression.rs IntDiv). */
    def floorDiv(other: Column): Column = floor(c / other).cast("long")
    /** `**` */
    def **(other: Column): Column = pow(c, other)
  }

  /** `str.*` namespace (internals/expressions/string.py:33-872) — all native. */
  final class StrOps(private val c: Column) extends AnyVal {
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
    def strip: Column = trim(c)
    def title: Column = initcap(org.apache.spark.sql.functions.lower(c))
    def count(sub: Column): Column =
      when(length(sub) === 0, lit(null))
        .otherwise(((length(c) - length(org.apache.spark.sql.functions.replace(c, sub, lit("")))) / length(sub)).cast("long"))
    def find(sub: Column): Column = (instr(c, sub.cast("string")) - 1).cast("long")
    def removeprefix(p: Column): Column =
      when(c.startsWith(p), c.substr(length(p) + 1, length(c))).otherwise(c)
    def removesuffix(s: Column): Column =
      when(c.endsWith(s), c.substr(lit(1), length(c) - length(s))).otherwise(c)
    /** python-style [start, end) slice, 0-based. */
    def slice(start: Int, end: Int): Column = c.substr(lit(start + 1), lit(end - start))
    def parseInt: Column = c.cast("long")
    def parseFloat: Column = c.cast("double")
    def parseBool: Column = org.apache.spark.sql.functions.lower(c).isin("true", "1", "yes", "on")
    def splitBy(sep: String): Column =
      org.apache.spark.sql.functions.split(c, java.util.regex.Pattern.quote(sep))
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
    def strftime(fmt: String): Column = date_format(c, fmt)
    /** dt.strptime (date_time.py strptime): parse a string column. */
    def strptime(fmt: String): Column = to_timestamp(c, fmt).cast("timestamp_ntz")
    /** dt.from_timestamp(unit): epoch number → timestamp (date_time.py from_timestamp). */
    def fromTimestampSec: Column = timestamp_seconds(c).cast("timestamp_ntz")
    def fromTimestampMs: Column = timestamp_millis(c.cast("long")).cast("timestamp_ntz")
    def fromTimestampUs: Column = timestamp_micros(c.cast("long")).cast("timestamp_ntz")
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
    def toUtc(tz: String): Column = to_utc_timestamp(c, tz)
    def toNaiveInTimezone(tz: String): Column = from_utc_timestamp(c, tz)
  }

  /** `num.*` namespace (internals/expressions/numerical.py:30-144). */
  final class NumOps(private val c: Column) extends AnyVal {
    def abs: Column = org.apache.spark.sql.functions.abs(c)
    def round(decimals: Int): Column = org.apache.spark.sql.functions.round(c, decimals)
    def fillNa(v: Column): Column = coalesce(nanvl(c, lit(null)), v)
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
}
