package graft.functions

import java.time.{DayOfWeek, Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.temporal.{IsoFields, ChronoField}
import java.util.concurrent.ConcurrentHashMap
import java.util.regex.{Matcher, Pattern}

/** Chrono-style (`%`-directive) datetime formatting and parsing — the format
  * language of the reference's `dt.strftime` / `dt.strptime`
  * (reference src/engine/time.rs:152/219/270/320: chrono `format`/
  * `parse_from_str`; python/pathway/internals/expressions/date_time.py).
  *
  * Spark's own `date_format`/`to_timestamp` speak Java patterns, so a library
  * user migrating `%Y-%m-%d`-style code would silently mis-format; this engine
  * interprets the chrono directives directly at the documented µs precision
  * (ns fields print as `micro*1000`; parsed fractions truncate to µs —
  * SURVEY §3 precision mapping).
  *
  * Everything here is driver/executor-side JVM code invoked from codegen'd
  * expressions ([[ChronoStrftime]]/[[ChronoStrptime]]); compiled formats are
  * cached per distinct format string, so the per-row cost is one hash lookup
  * plus the directive loop.
  */
object ChronoFormat {

  /** Reference sanitize (time.rs:106): `.%f` rewrites to the chrono `%.f`
    * (dot + flexible 1-9 digit fraction); any remaining bare `%f` that is not
    * an escaped `%%f` is an error — replicated message included. Used by
    * strptime only (strftime formats verbatim, time.rs:219). */
  def sanitize(format: String): String = {
    val replaced = format.replace(".%f", "%.f")
    def countOf(s: String, sub: String): Int = {
      var c = 0; var i = s.indexOf(sub)
      while (i >= 0) { c += 1; i = s.indexOf(sub, i + sub.length) }
      c
    }
    if (countOf(replaced, "%f") == countOf(replaced, "%%f")) replaced
    else throw new IllegalArgumentException(
      s"""parse error: cannot use format "$replaced": using "%f" without the leading dot is not supported""")
  }

  private val WEEKDAY_ABBR = Array("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
  private val WEEKDAY_FULL =
    Array("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")
  private val MONTH_ABBR =
    Array("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val MONTH_FULL = Array("January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December")

  private def pad(n: Int, w: Int): String = {
    val s = math.abs(n).toString
    val p = if (s.length >= w) s else "0" * (w - s.length) + s
    if (n < 0) "-" + p else p
  }

  /** micros since epoch → wall-clock LocalDateTime (UTC fields). */
  def toLdt(us: Long): LocalDateTime = {
    val sec = Math.floorDiv(us, 1000000L)
    val micro = Math.floorMod(us, 1000000L)
    LocalDateTime.ofEpochSecond(sec, micro.toInt * 1000, ZoneOffset.UTC)
  }

  def fromLdt(ldt: LocalDateTime): Long =
    ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L

  // ─────────────────────────── strftime ───────────────────────────

  private val strftimeCache = new ConcurrentHashMap[String, Array[(LocalDateTime, Boolean) => String]]()

  /** Format `us` (micros since epoch, wall clock already in the frame the
    * caller wants — UTC for DateTimeUtc, naive wall time for DateTimeNaive).
    * `isUtc` only controls the offset/tz-name directives: `%z`→`+0000`,
    * `%:z`→`+00:00`, `%Z`→`UTC`; on a naive input those error like chrono's
    * formatter does on a missing offset field (pinned xfail,
    * tests/expressions/test_datetimes.py:243). */
  def strftimeMicros(us: Long, format: String, isUtc: Boolean): String = {
    var parts = strftimeCache.get(format)
    if (parts == null) {
      parts = compileStrftime(format)
      if (strftimeCache.size < 4096) strftimeCache.put(format, parts)
    }
    val ldt = toLdt(us)
    val sb = new java.lang.StringBuilder(format.length + 8)
    var i = 0
    while (i < parts.length) { sb.append(parts(i)(ldt, isUtc)); i += 1 }
    sb.toString
  }

  private def lit(s: String): (LocalDateTime, Boolean) => String = (_, _) => s

  private def noOffset(): Nothing = throw new IllegalArgumentException(
    "format error: timezone directive (%z/%Z) on a naive datetime")

  // C-like week numbers: yday 1-based here; tm-style formulas use 0-based.
  private def weekSunday(d: LocalDateTime): Int = {
    val yday = d.getDayOfYear - 1
    val wday = d.getDayOfWeek.getValue % 7 // Sunday=0
    (yday + 7 - wday) / 7
  }
  private def weekMonday(d: LocalDateTime): Int = {
    val yday = d.getDayOfYear - 1
    val wday = (d.getDayOfWeek.getValue + 6) % 7 // Monday=0
    (yday + 7 - wday) / 7
  }

  private def fraction(d: LocalDateTime, digits: Int): String = {
    val ns = d.getNano // always micro*1000 here
    pad((ns / math.pow(10, 9 - digits).toLong).toInt, digits)
  }

  /** `%.f`: dot + 3/6/9 digits by significance; empty when the fraction is 0
    * (chrono's flexible formatting rule). */
  private def dotFraction(d: LocalDateTime): String = {
    val ns = d.getNano
    if (ns == 0) ""
    else if (ns % 1000000 == 0) "." + pad(ns / 1000000, 3)
    else if (ns % 1000 == 0) "." + pad(ns / 1000, 6)
    else "." + pad(ns, 9)
  }

  private def compileStrftime(format: String): Array[(LocalDateTime, Boolean) => String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(LocalDateTime, Boolean) => String]
    val litBuf = new java.lang.StringBuilder
    def flushLit(): Unit =
      if (litBuf.length > 0) { out += lit(litBuf.toString); litBuf.setLength(0) }
    var i = 0
    def directive(spec: String): (LocalDateTime, Boolean) => String = spec match {
      case "a" => (d, _) => WEEKDAY_ABBR(d.getDayOfWeek.getValue - 1)
      case "A" => (d, _) => WEEKDAY_FULL(d.getDayOfWeek.getValue - 1)
      case "w" => (d, _) => (d.getDayOfWeek.getValue % 7).toString
      case "u" => (d, _) => d.getDayOfWeek.getValue.toString
      case "d" => (d, _) => pad(d.getDayOfMonth, 2)
      case "e" => (d, _) => { val s = d.getDayOfMonth.toString; if (s.length < 2) " " + s else s }
      case "b" | "h" => (d, _) => MONTH_ABBR(d.getMonthValue - 1)
      case "B" => (d, _) => MONTH_FULL(d.getMonthValue - 1)
      case "m" => (d, _) => pad(d.getMonthValue, 2)
      case "y" => (d, _) => pad(Math.floorMod(d.getYear, 100), 2)
      case "Y" => (d, _) => pad(d.getYear, 4)
      case "G" => (d, _) => pad(d.get(IsoFields.WEEK_BASED_YEAR), 4)
      case "V" => (d, _) => pad(d.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR), 2)
      case "U" => (d, _) => pad(weekSunday(d), 2)
      case "W" => (d, _) => pad(weekMonday(d), 2)
      case "j" => (d, _) => pad(d.getDayOfYear, 3)
      case "H" => (d, _) => pad(d.getHour, 2)
      case "I" => (d, _) => pad({ val h = d.getHour % 12; if (h == 0) 12 else h }, 2)
      case "p" => (d, _) => if (d.getHour < 12) "AM" else "PM"
      case "M" => (d, _) => pad(d.getMinute, 2)
      case "S" => (d, _) => pad(d.getSecond, 2)
      case "f" => (d, _) => fraction(d, 9)
      case "3f" => (d, _) => fraction(d, 3)
      case "6f" => (d, _) => fraction(d, 6)
      case "9f" => (d, _) => fraction(d, 9)
      case ".f" => (d, _) => dotFraction(d)
      case ".3f" => (d, _) => "." + fraction(d, 3)
      case ".6f" => (d, _) => "." + fraction(d, 6)
      case ".9f" => (d, _) => "." + fraction(d, 9)
      case "z" => (_, utc) => if (utc) "+0000" else noOffset()
      case ":z" => (_, utc) => if (utc) "+00:00" else noOffset()
      case "Z" => (_, utc) => if (utc) "UTC" else noOffset()
      case "c" => (d, u) => // ctime: %a %b %e %H:%M:%S %Y
        s"${WEEKDAY_ABBR(d.getDayOfWeek.getValue - 1)} ${MONTH_ABBR(d.getMonthValue - 1)} " +
          directive("e")(d, u) + s" ${pad(d.getHour, 2)}:${pad(d.getMinute, 2)}:${pad(d.getSecond, 2)} ${pad(d.getYear, 4)}"
      case "x" => (d, _) => s"${pad(d.getMonthValue, 2)}/${pad(d.getDayOfMonth, 2)}/${pad(Math.floorMod(d.getYear, 100), 2)}"
      case "X" => (d, _) => s"${pad(d.getHour, 2)}:${pad(d.getMinute, 2)}:${pad(d.getSecond, 2)}"
      case "D" => (d, _) => s"${pad(d.getMonthValue, 2)}/${pad(d.getDayOfMonth, 2)}/${pad(Math.floorMod(d.getYear, 100), 2)}"
      case "F" => (d, _) => s"${pad(d.getYear, 4)}-${pad(d.getMonthValue, 2)}-${pad(d.getDayOfMonth, 2)}"
      case "T" => (d, _) => s"${pad(d.getHour, 2)}:${pad(d.getMinute, 2)}:${pad(d.getSecond, 2)}"
      case "R" => (d, _) => s"${pad(d.getHour, 2)}:${pad(d.getMinute, 2)}"
      case "n" => lit("\n")
      case "t" => lit("\t")
      case other => throw new IllegalArgumentException(
        s"""format error: unsupported strftime directive "%$other"""")
    }
    while (i < format.length) {
      val ch = format.charAt(i)
      if (ch != '%') { litBuf.append(ch); i += 1 }
      else if (i + 1 >= format.length)
        throw new IllegalArgumentException("format error: trailing '%'")
      else {
        val c1 = format.charAt(i + 1)
        if (c1 == '%') { litBuf.append('%'); i += 2 }
        else {
          // multi-char specs: %:z, %.f, %.3f/.6f/.9f, %3f/%6f/%9f
          val spec =
            if (c1 == ':' && i + 2 < format.length && format.charAt(i + 2) == 'z') ":z"
            else if (c1 == '.' && i + 2 < format.length && format.charAt(i + 2) == 'f') ".f"
            else if (c1 == '.' && i + 3 < format.length && "369".indexOf(format.charAt(i + 2)) >= 0 &&
              format.charAt(i + 3) == 'f') "." + format.charAt(i + 2) + "f"
            else if ("369".indexOf(c1) >= 0 && i + 2 < format.length && format.charAt(i + 2) == 'f')
              c1.toString + "f"
            else c1.toString
          flushLit()
          out += directive(spec)
          i += 1 + spec.length
        }
      }
    }
    flushLit()
    out.toArray
  }

  // ─────────────────────────── strptime ───────────────────────────

  /** One compiled parse format: anchored regex + per-group field tags +
    * the sanitized text (for the reference's error messages). Cached by the
    * RAW format string so the hot path pays one hash lookup — sanitize's
    * replace+count scans run only on a compile miss. */
  private final case class ParseFmt(pattern: Pattern, fields: Array[String],
      sanitized: String)
  private val strptimeCache = new ConcurrentHashMap[String, ParseFmt]()

  private def compileStrptime(sanitized: String): ParseFmt = {
    val re = new java.lang.StringBuilder
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < sanitized.length) {
      val ch = sanitized.charAt(i)
      if (ch != '%') { re.append(Pattern.quote(ch.toString)); i += 1 }
      else {
        val c1 = if (i + 1 < sanitized.length) sanitized.charAt(i + 1) else
          throw new IllegalArgumentException("parse error: trailing '%'")
        var consumed = 2
        c1 match {
          case '%' => re.append(Pattern.quote("%"))
          case 'Y' => re.append("([+-]?\\d{4})"); fields += "Y"
          case 'y' => re.append("(\\d{2})"); fields += "y"
          case 'm' => re.append("(\\d{1,2})"); fields += "m"
          case 'd' => re.append("(\\d{1,2})"); fields += "d"
          case 'e' => re.append("\\s?(\\d{1,2})"); fields += "d"
          case 'H' => re.append("(\\d{1,2})"); fields += "H"
          case 'I' => re.append("(\\d{1,2})"); fields += "I"
          case 'M' => re.append("(\\d{1,2})"); fields += "M"
          case 'S' => re.append("(\\d{1,2})"); fields += "S"
          case 'j' => re.append("(\\d{1,3})"); fields += "j"
          case 'p' => re.append("((?i:AM|PM))"); fields += "p"
          case 'P' => re.append("((?i:AM|PM))"); fields += "p"
          case 'b' | 'h' => re.append("((?i:" + MONTH_ABBR.mkString("|") + "))"); fields += "b"
          case 'B' => re.append("((?i:" + MONTH_FULL.mkString("|") + "))"); fields += "B"
          case 'a' => re.append("(?i:" + WEEKDAY_ABBR.mkString("|") + ")")
          case 'A' => re.append("(?i:" + WEEKDAY_FULL.mkString("|") + ")")
          case 'z' => re.append("([+-]\\d{2}:?\\d{2}|Z)"); fields += "z"
          case ':' if i + 2 < sanitized.length && sanitized.charAt(i + 2) == 'z' =>
            re.append("([+-]\\d{2}:?\\d{2}|Z)"); fields += "z"; consumed = 3
          case '.' if i + 2 < sanitized.length && sanitized.charAt(i + 2) == 'f' =>
            re.append("(?:\\.(\\d{1,9}))?"); fields += "f"; consumed = 3
          case '.' if i + 3 < sanitized.length && "369".indexOf(sanitized.charAt(i + 2)) >= 0 &&
              sanitized.charAt(i + 3) == 'f' =>
            // chrono %.3f/%.6f/%.9f: OPTIONAL dot + EXACTLY N digits
            // (scan::nanosecond_fixed requires the full width when present)
            re.append(s"(?:\\.(\\d{${sanitized.charAt(i + 2) - '0'}}))?")
            fields += "f"; consumed = 4
          case '3' | '6' | '9' if i + 2 < sanitized.length && sanitized.charAt(i + 2) == 'f' =>
            // fixed-width fraction without the dot (chrono %3f/%6f/%9f)
            re.append(s"(\\d{1,${c1 - '0'}})"); fields += "f"; consumed = 3
          case 'T' => re.append("(\\d{1,2}):(\\d{1,2}):(\\d{1,2})"); fields ++= Seq("H", "M", "S")
          case 'F' => re.append("([+-]?\\d{4})-(\\d{1,2})-(\\d{1,2})"); fields ++= Seq("Y", "m", "d")
          case other => throw new IllegalArgumentException(
            s"""parse error: unsupported strptime directive "%$other"""")
        }
        i += consumed
      }
    }
    ParseFmt(Pattern.compile(re.toString), fields.toArray, sanitized)
  }

  private def parseError(s: String, fmt: String): Nothing =
    throw new IllegalArgumentException(
      s"""parse error: cannot parse date "$s" using format "$fmt"""")

  /** Parse with the reference's fallback chain (time.rs:152): full datetime,
    * else date-only at midnight, else time-only on 1900-01-01. Fractions
    * truncate to µs. Returns micros since epoch of the NAIVE wall time. */
  def strptimeNaiveMicros(s: String, format: String): Long =
    parseFields(s, format, requireOffset = false)

  /** Zone-aware parse (time.rs:270, DateTimeUtc::strptime): the offset is
    * required; the result is the UTC instant in micros. */
  def strptimeUtcMicros(s: String, format: String): Long =
    parseFields(s, format, requireOffset = true)

  private def parseFields(s: String, format: String, requireOffset: Boolean): Long = {
    var pf = strptimeCache.get(format)
    if (pf == null) {
      pf = compileStrptime(sanitize(format))
      if (strptimeCache.size < 4096) strptimeCache.put(format, pf)
    }
    val sanitized = pf.sanitized
    val m: Matcher = pf.pattern.matcher(s)
    if (!m.matches()) parseError(s, sanitized)
    var year = Int.MinValue; var month = -1; var day = -1; var yday = -1
    var hour = -1; var hour12 = -1; var pm = -1; var minute = -1; var second = -1
    var fracNs = 0L; var offsetSec = Int.MinValue
    var g = 0
    while (g < pf.fields.length) {
      val v = m.group(g + 1)
      if (v != null) pf.fields(g) match {
        case "Y" => year = v.toInt
        case "y" => val yy = v.toInt; year = if (yy < 69) 2000 + yy else 1900 + yy
        case "m" => month = v.toInt
        case "d" => day = v.toInt
        case "j" => yday = v.toInt
        case "H" => hour = v.toInt
        case "I" => hour12 = v.toInt
        case "M" => minute = v.toInt
        case "S" => second = v.toInt
        case "p" => pm = if (v.equalsIgnoreCase("PM")) 1 else 0
        case "b" => month = MONTH_ABBR.indexWhere(_.equalsIgnoreCase(v)) + 1
        case "B" => month = MONTH_FULL.indexWhere(_.equalsIgnoreCase(v)) + 1
        case "f" => fracNs = (v + "0" * (9 - v.length)).toLong
        case "z" =>
          offsetSec =
            if (v == "Z") 0
            else {
              val sign = if (v.charAt(0) == '-') -1 else 1
              val digits = v.substring(1).replace(":", "")
              sign * (digits.substring(0, 2).toInt * 3600 + digits.substring(2, 4).toInt * 60)
            }
      }
      g += 1
    }
    if (hour12 >= 0) {
      // chrono requires BOTH halves of a 12-hour time (%I without %p leaves
      // hour_div_12 unset → NotEnough) and set_hour12 rejects values
      // outside 1..=12 (OUT_OF_RANGE)
      if (pm < 0 || hour12 < 1 || hour12 > 12) parseError(s, sanitized)
      val base = hour12 % 12
      hour = if (pm == 1) base + 12 else base
    }
    val haveDate = year != Int.MinValue && ((month > 0 && day > 0) || yday > 0)
    val haveTime = hour >= 0 || minute >= 0 || second >= 0 || fracNs > 0
    if (requireOffset && (offsetSec == Int.MinValue || !haveDate)) parseError(s, sanitized)
    val date: LocalDate =
      if (haveDate) {
        try {
          if (month > 0) LocalDate.of(year, month, day)
          else LocalDate.ofYearDay(year, yday)
        } catch { case _: java.time.DateTimeException => parseError(s, sanitized) }
      } else if (!haveTime || year != Int.MinValue || month > 0 || day > 0) {
        parseError(s, sanitized) // partial date (reference chain: all parses fail)
      } else LocalDate.of(1900, 1, 1) // time-only fallback (time.rs:160)
    val h = math.max(hour, 0); val mi = math.max(minute, 0); val se = math.max(second, 0)
    if (h > 23 || mi > 59 || se > 59) parseError(s, sanitized)
    val ldt = LocalDateTime.of(date.getYear, date.getMonthValue, date.getDayOfMonth, h, mi, se,
      (fracNs / 1000L * 1000L).toInt) // µs truncation (documented ns→µs mapping)
    val naiveUs = fromLdt(ldt)
    if (requireOffset) naiveUs - offsetSec * 1000000L else naiveUs
  }

  // ─────────────── unit multipliers (time.rs:125 get_unit_multiplier) ───────────────

  /** The reference's unit alias → ns multiplier table, exposed as data so
    * Column-level consumers (Exprs.DtOps.toDuration's when-chain) derive from
    * the SAME source instead of copying it. */
  val unitAliases: Seq[(String, Long)] = {
    val groups = Seq(
      Seq("W") -> 7L * 24 * 60 * 60 * 1000 * 1000 * 1000,
      Seq("D", "days", "day") -> 24L * 60 * 60 * 1000 * 1000 * 1000,
      Seq("h", "hr", "hour", "hours") -> 60L * 60 * 1000 * 1000 * 1000,
      Seq("m", "min", "minute", "minutes") -> 60L * 1000 * 1000 * 1000,
      Seq("s", "sec", "second", "seconds") -> 1000L * 1000 * 1000,
      Seq("ms", "milli", "millis", "millisecond", "milliseconds") -> 1000L * 1000,
      Seq("us", "micro", "micros", "microsecond", "microseconds") -> 1000L,
      Seq("ns", "nano", "nanos", "nanosecond", "nanoseconds") -> 1L)
    groups.flatMap { case (as, mult) => as.map(_ -> mult) }
  }
  private val unitMap = unitAliases.toMap

  /** ns multiplier for the reference's duration/timestamp unit aliases. */
  def unitMultiplierNs(unit: String): Long =
    unitMap.getOrElse(unit, throw new IllegalArgumentException(
      s"""unit has to be a valid time unit but is "$unit""""))

  /** Parse a pandas-style offset string ("D", "2H3T", "14L22ms14us", "min",
    * "S", "U", "N") into ns — the `round_to` argument form of the reference's
    * `dt.round`/`dt.floor` (pandas Timedelta aliases; tests/expressions/
    * test_datetimes.py:830-837). */
  def pandasOffsetNs(spec: String): Long = {
    val tok = Pattern.compile("(\\d*)([A-Za-z]+)").matcher(spec)
    var total = 0L; var consumed = 0
    while (tok.find()) {
      if (tok.start != consumed)
        throw new IllegalArgumentException(s"invalid offset string: $spec")
      consumed = tok.end
      val n = if (tok.group(1).isEmpty) 1L else tok.group(1).toLong
      val u = tok.group(2) match {
        case "W" | "w" => 7L * 86400 * 1000000000L
        case "D" | "d" | "day" | "days" => 86400L * 1000000000L
        case "H" | "h" | "hr" | "hour" | "hours" => 3600L * 1000000000L
        case "T" | "t" | "min" | "minute" | "minutes" => 60L * 1000000000L
        case "S" | "s" | "sec" | "second" | "seconds" => 1000000000L
        case "L" | "l" | "ms" | "milli" | "millis" | "millisecond" | "milliseconds" => 1000000L
        case "U" | "u" | "us" | "micro" | "micros" | "microsecond" | "microseconds" => 1000L
        case "N" | "n" | "ns" | "nano" | "nanos" | "nanosecond" | "nanoseconds" => 1L
        case other => throw new IllegalArgumentException(
          s"invalid offset alias '$other' in: $spec")
      }
      total += n * u
    }
    if (consumed != spec.length || total <= 0)
      throw new IllegalArgumentException(s"invalid offset string: $spec")
    total
  }

  // ─────────────── to_utc gap/fold rule (time.rs:558 to_utc_from_timezone) ───────────────

  private val zoneCache = new ConcurrentHashMap[String, java.time.ZoneId]()

  /** Naive wall time (µs) in `timezone` → UTC instant (µs), with the
    * reference's resolution rules: an ambiguous (fold) time resolves to the
    * LATER instant (`LocalResult::Ambiguous(_, localized)` takes the second);
    * a nonexistent (gap) time moves +30 min, rounds to the nearest hour
    * (ties up — chrono `duration_round`), and localizes the result, which for
    * one-hour gaps lands exactly on the post-transition wall time. Java's own
    * `ZonedDateTime` rules (earlier instant; gap shifts by gap length) would
    * silently diverge — pinned by tests/expressions/test_datetimes.py:574. */
  def toUtcMicros(naiveUs: Long, timezone: String): Long = {
    var zone = zoneCache.get(timezone)
    if (zone == null) {
      zone = java.time.ZoneId.of(timezone)
      zoneCache.put(timezone, zone)
    }
    val rules = zone.getRules
    val ldt = toLdt(naiveUs)
    val offsets = rules.getValidOffsets(ldt)
    if (!offsets.isEmpty) {
      val off = offsets.get(offsets.size - 1) // later instant on a fold
      naiveUs - off.getTotalSeconds * 1000000L
    } else {
      // gap: (t + 30 min) rounded to the nearest hour, ties up
      val moved = naiveUs + 30L * 60 * 1000000L
      val hourUs = 3600L * 1000000L
      val rem = Math.floorMod(moved, hourUs)
      val rounded = moved - rem + (if (2 * rem >= hourUs) hourUs else 0L)
      val roundedLdt = toLdt(rounded)
      val offs2 = rules.getValidOffsets(roundedLdt)
      if (offs2.size == 1) rounded - offs2.get(0).getTotalSeconds * 1000000L
      else throw new IllegalArgumentException(
        s"cannot convert non-existing local time ${ldt} to UTC in timezone $timezone")
    }
  }
}
