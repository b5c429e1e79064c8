package graft.sources

/** Duration-parameter coercion for connectors (reference
  * `io/_utils.py:93 as_duration_seconds`; tests/test_io.py:4893-4940).
  *
  * Every connector duration knob (refresh intervals, timeouts) accepts "a
  * number of seconds (int or float) or a timedelta" and is validated ONCE,
  * centrally: ints/floats are seconds, timedelta-likes convert via total
  * seconds (java.time.Duration / scala.concurrent.duration here — the JVM
  * twins of `datetime.timedelta`/`pd.Timedelta`/`pw.Duration`, which all
  * subclass timedelta), booleans are rejected even though python bools are
  * ints, non-finite values are rejected, negatives are rejected, and zero
  * is allowed by default (a zero polling interval legitimately means "poll
  * as fast as possible" at the price of a busy-wait) unless the parameter
  * opts out (`allowZero = false` for timeout-like knobs). Error messages
  * are the reference's verbatim. */
object Durations {

  def asDurationSeconds(value: Any, paramName: String,
      allowZero: Boolean = true): Double = {
    val seconds: Double = value match {
      case d: java.time.Duration =>
        d.getSeconds.toDouble + d.getNano / 1e9
      case d: scala.concurrent.duration.FiniteDuration =>
        d.toNanos / 1e9
      case _: Boolean | _: java.lang.Boolean =>
        // python bools ARE ints; the reference still rejects them explicitly
        throw new IllegalArgumentException(typeError(paramName, value))
      case n: Int => n.toDouble
      case n: Long => n.toDouble
      case n: Short => n.toDouble
      case n: Byte => n.toDouble
      case n: Float => n.toDouble
      case n: Double => n
      case _ =>
        throw new IllegalArgumentException(typeError(paramName, value))
    }
    if (seconds.isNaN || seconds.isInfinite)
      throw new IllegalArgumentException(
        s"'$paramName' must be finite, got $value")
    if (seconds < 0 || (seconds == 0 && !allowZero)) {
      val constraint = if (allowZero) "non-negative" else "positive"
      throw new IllegalArgumentException(
        s"'$paramName' must be $constraint, got $value")
    }
    seconds
  }

  private def typeError(paramName: String, value: Any): String =
    s"'$paramName' must be a number of seconds (int or float) or a " +
      s"datetime.timedelta, got ${if (value == null) "NoneType" else value.getClass.getSimpleName}"
}
