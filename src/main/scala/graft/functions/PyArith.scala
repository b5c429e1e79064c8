package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Python/reference arithmetic semantics for `//`, `%`, `/` and int `**`
  * (r16 decode of tests/test_operators.py against IntExpression /
  * FloatExpression, src/engine/expression.rs:1061-1203):
  *   - int floor-div / floor-mod (Integer::div_floor / mod_floor — exact on
  *     the full i64 range, floor toward −∞, mod takes the DIVISOR's sign);
  *   - float floor-div = `(l/r).floor()`, float mod = the CPython
  *     float_mod replica (fmod, then sign-adjust toward the divisor);
  *   - ALL divisions error with the reference's "division by zero" (Spark's
  *     non-ANSI null would silently swallow it);
  *   - int ** int = i64 wrapping pow (numpy/Rust release semantics), not
  *     the double `pow` Spark would lose exactness on past 2^53.
  * Static JVM methods invoked from codegen — no CodegenFallback. */
object PyArith {
  private def divZero(): Nothing =
    throw new ArithmeticException("division by zero")

  def floorDivLong(a: Long, b: Long): Long =
    if (b == 0L) divZero() else Math.floorDiv(a, b)
  def floorModLong(a: Long, b: Long): Long =
    if (b == 0L) divZero() else Math.floorMod(a, b)
  def floorDivDouble(a: Double, b: Double): Double =
    if (b == 0.0) divZero() else math.floor(a / b)
  /** CPython float_mod (floatobject.c float_divmod; replicated verbatim by
    * the reference, expression.rs:1175). */
  def floorModDouble(a: Double, b: Double): Double = {
    if (b == 0.0) divZero()
    var m = a % b
    if (m == 0.0) m = java.lang.Math.copySign(m, b)
    else if ((b < 0.0) != (m < 0.0)) m += b
    m
  }
  def trueDivDouble(a: Double, b: Double): Double =
    if (b == 0.0) divZero() else a / b
  /** Rust i64 `/` (truncating toward zero) with the zero error — the
    * reference's Duration.true_div_by_i64 (time.rs:426). */
  def truncDivLong(a: Long, b: Long): Long =
    if (b == 0L) divZero() else a / b
  /** i64 wrapping pow, replicating the reference's `l.pow(r as u32)`
    * (expression.rs:1077) EXACTLY: the exponent is the u32 WRAP of r (so a
    * negative exponent becomes a huge one — typed int**int never routes to
    * float in the reference), and the squaring multiplies wrap like Rust
    * release mode / numpy int64. */
  def powLong(a: Long, b: Long): Long = {
    var base = a
    var exp = java.lang.Integer.toUnsignedLong(b.toInt) // r as u32
    var acc = 1L
    while (exp > 0) { // wrapping multiply == JVM long multiply
      if ((exp & 1L) == 1L) acc *= base
      base *= base
      exp >>= 1
    }
    acc
  }
}

/** kind: "floordiv" | "mod" | "truediv" | "pow". Inputs may be integral or
  * double in any combination — a mixed pair computes in double, matching the
  * reference's int→float widening route; truediv always returns double;
  * pow on two integrals is the wrapping i64 pow (IntExpression::Pow), on
  * anything else powf (FloatExpression::Pow). */
private[graft] case class PyArithOp(left: Expression, right: Expression, kind: String)
    extends BinaryExpression {
  private def integral(dt: DataType): Boolean =
    dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType
  private def isLong =
    kind != "truediv" && integral(left.dataType) && integral(right.dataType)
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e =>
        integral(e.dataType) || e.dataType == DoubleType || e.dataType == FloatType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"py_$kind requires numeric inputs, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = if (isLong) LongType else DoubleType

  private def asL(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case sh: Short => sh.toLong
    case b: Byte => b.toLong
    case other => throw new IllegalStateException(s"not integral: $other")
  }
  private def asD(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case other => asL(other).toDouble
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLong) kind match {
      case "floordiv" => PyArith.floorDivLong(asL(a), asL(b))
      case "mod" => PyArith.floorModLong(asL(a), asL(b))
      case "truncdiv" => PyArith.truncDivLong(asL(a), asL(b))
      case "pow" => PyArith.powLong(asL(a), asL(b))
      case other => throw new IllegalStateException(s"unknown kind $other")
    } else kind match {
      case "floordiv" => PyArith.floorDivDouble(asD(a), asD(b))
      case "mod" => PyArith.floorModDouble(asD(a), asD(b))
      case "truediv" => PyArith.trueDivDouble(asD(a), asD(b))
      case "pow" => java.lang.Math.pow(asD(a), asD(b))
      case other => throw new IllegalStateException(s"unknown kind $other")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // java widens long args to the double-typed params automatically
    val call =
      if (isLong) kind match {
        case "floordiv" => "graft.functions.PyArith.floorDivLong"
        case "mod" => "graft.functions.PyArith.floorModLong"
        case "truncdiv" => "graft.functions.PyArith.truncDivLong"
        case _ => "graft.functions.PyArith.powLong"
      }
      else kind match {
        case "floordiv" => "graft.functions.PyArith.floorDivDouble"
        case "mod" => "graft.functions.PyArith.floorModDouble"
        case "truediv" => "graft.functions.PyArith.trueDivDouble"
        case _ => "java.lang.Math.pow"
      }
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $call($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PyArithOp =
    copy(left = l, right = r)
}

/** pw.cast(bool, x): python TRUTHINESS (expression.rs CastFromInt/Float/
  * String at the BoolExpression tail: `v != 0`, `v != 0.0`, `!v.is_empty()`)
  * — NOT Spark's "true"/"false" string parsing: cast(bool, "False") is TRUE
  * (non-empty), cast(bool, "") is false (r16 decode of test_common test_cast).
  * RuntimeReplaceable → rewrites to plain codegen'd comparisons. */
private[graft] case class PyCastBool(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions._
  override lazy val replacement: Expression = child.dataType match {
    case StringType => GreaterThan(Length(child), Literal(0))
    case DoubleType | FloatType => Not(EqualTo(child, Cast(Literal(0.0d), child.dataType)))
    case BooleanType => child
    case _ => Not(EqualTo(child, Cast(Literal(0L), child.dataType)))
  }
  override protected def withNewChildInternal(newChild: Expression): PyCastBool =
    copy(child = newChild)
}

/** int ** int with i64 wrapping semantics. */
private[graft] case class PyIntPow(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"py_int_pow requires long inputs, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    PyArith.powLong(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PyArith.powLong($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PyIntPow =
    copy(left = l, right = r)
}
