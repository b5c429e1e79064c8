package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Exprs._

/** Bit-exact replays of the reference's typed arithmetic matrices
  * (tests/test_operators.py → IntExpression/FloatExpression,
  * src/engine/expression.rs:1061-1203): python floor-div/floor-mod on the
  * full i64 range, CPython float mod, int/int true division as float,
  * wrapping int pow, shifts, bitwise ops — and "division by zero" errors
  * where Spark's non-ANSI operators return null. Goldens are numpy/pandas
  * outputs (the reference tests' own comparator), doubles stored as IEEE
  * bit patterns for exactness (tools/gen_expr_goldens.py). */
class OperatorFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def golden(name: String): Seq[Array[String]] = {
    val in = getClass.getResourceAsStream(s"/expr_goldens/$name")
    Predef.require(in != null, s"missing golden $name — run tools/gen_expr_goldens.py")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map(_.split("\t", -1)).toList
  }

  test("duration matrix replays test_duration: +,-, // → int floor, / → float ratio, % → floor-mod") {
    val rows = golden("ops_duration.tsv").map(r => (r(0).toLong, r(1).toLong, r(2), r(3).toLong))
    for ((op, group) <- rows.groupBy(_._3)) {
      val df = group.map(r => (r._1, r._2, r._4)).toDF("a", "b", "expected")
      val actual: Column = op match {
        case "add" => col("a") + col("b")
        case "sub" => col("a") - col("b")
        case "floordiv" => col("a").dur.floorDivDur(col("b"))
        case "mod" => col("a").dur.modDur(col("b"))
        case "truediv_bits" => GraftTestBits.bitsOf(col("a").dur.trueDivDur(col("b")))
      }
      val bad = df.select(col("a"), col("b"), col("expected"), actual.as("actual"))
        .filter(!(col("actual") <=> col("expected"))).collect()
      assert(bad.isEmpty, s"duration $op mismatches: ${bad.take(5).mkString("; ")}")
    }
  }

  test("duration × int/float replays test_duration_and_int: truediv TRUNCATES, floordiv FLOORS") {
    val rows = golden("ops_duration_int.tsv").map(r => (r(0).toLong, r(1).toLong, r(2), r(3).toLong))
    for ((op, group) <- rows.groupBy(_._3)) {
      val df = group.map(r => (r._1, r._2, r._4)).toDF("a", "b", "expected")
      val actual: Column = op match {
        case "mul_int" => col("a").dur.mulBy(col("b"))
        case "floordiv_int" => col("a").dur.floorDivBy(col("b"))
        case "truediv_int" => col("a").dur.trueDivBy(col("b"))
        case "mul_float" => col("a").dur.mulByFloat(col("b").cast("double"))
        case "truediv_float" => col("a").dur.divByFloat(col("b").cast("double"))
      }
      val bad = df.select(col("a"), col("b"), col("expected"), actual.as("actual"))
        .filter(!(col("actual") <=> col("expected"))).collect()
      assert(bad.isEmpty, s"duration-int $op mismatches: ${bad.take(5).mkString("; ")}")
    }
    // the decisive pinned pair: -11ns // 3 floors to -4, -11ns / 3 truncates to -3
    val pin = Seq((-11L, 3L)).toDF("a", "b")
      .select(col("a").dur.floorDivBy(col("b")).as("fd"),
        col("a").dur.trueDivBy(col("b")).as("td")).collect().head
    assert(pin.getLong(0) == -4L && pin.getLong(1) == -3L)
  }

  test("duration division by zero errors like the reference (floordiv, truediv, mod; ÷int too)") {
    for (mk <- Seq[(Column, Column) => Column](
        (a, b) => a.dur.floorDivDur(b), (a, b) => a.dur.trueDivDur(b),
        (a, b) => a.dur.modDur(b), (a, b) => a.dur.trueDivBy(b),
        (a, b) => a.dur.floorDivBy(b))) {
      val e = intercept[Exception] {
        Seq((-763723L, 0L)).toDF("a", "b").select(mk(col("a"), col("b"))).collect()
      }
      assert(e.getMessage != null && e.getMessage.contains("division by zero"),
        s"expected ZeroDivisionError, got $e")
    }
  }

  test("datetime ± duration replays test_date_time_and_duration on the µs grid (naive + utc)") {
    val rows = golden("ops_datetime_duration.tsv")
      .map(r => (r(0), r(1).toLong, r(2).toLong, r(3), r(4).toLong))
    for (kind <- Seq("naive", "utc"); (op, group) <- rows.filter(_._1 == kind).groupBy(_._4)) {
      val df = group.map(r => (r._2, r._3, r._5)).toDF("us", "d", "expected")
      val t = if (kind == "naive") timestamp_micros(col("us")).cast("timestamp_ntz")
        else timestamp_micros(col("us"))
      val actual = op match {
        case "add_us" => unix_micros(t.dt.addDuration(col("d")).cast("timestamp_ltz"))
        case "sub_us" => unix_micros(t.dt.subDuration(col("d")).cast("timestamp_ltz"))
      }
      val bad = df.select(col("us"), col("d"), col("expected"), actual.as("actual"))
        .filter(!(col("actual") <=> col("expected"))).collect()
      assert(bad.isEmpty, s"$kind $op mismatches: ${bad.take(5).mkString("; ")}")
    }
  }

  test("datetime − datetime and comparisons replay test_date_time on the µs grid") {
    val rows = golden("ops_datetime.tsv").map(r => (r(0), r(1).toLong, r(2).toLong, r(3), r(4)))
    for (kind <- Seq("naive", "utc")) {
      val sub = rows.filter(r => r._1 == kind && r._4 == "sub_ns")
        .map(r => (r._2, r._3, r._5.toLong)).toDF("ua", "ub", "expected")
      val cast = if (kind == "naive") "timestamp_ntz" else "timestamp"
      val a = timestamp_micros(col("ua")).cast(cast)
      val b = timestamp_micros(col("ub")).cast(cast)
      val badSub = sub.select(col("expected"), a.dt.subDateTime(b).as("actual"))
        .filter(!(col("actual") <=> col("expected"))).collect()
      assert(badSub.isEmpty, s"$kind sub mismatches: ${badSub.take(5).mkString("; ")}")
      for (op <- Seq("lt", "le", "gt", "ge", "eq", "ne")) {
        val cmp = rows.filter(r => r._1 == kind && r._4 == op)
          .map(r => (r._2, r._3, r._5 == "True")).toDF("ua", "ub", "expected")
        val actual: Column = op match {
          case "lt" => a < b; case "le" => a <= b; case "gt" => a > b
          case "ge" => a >= b; case "eq" => a === b; case "ne" => a =!= b
        }
        val bad = cmp.select(col("expected"), actual.as("actual"))
          .filter(!(col("actual") <=> col("expected"))).collect()
        assert(bad.isEmpty, s"$kind $op mismatches: ${bad.take(5).mkString("; ")}")
      }
    }
  }

  test("string * int replays test_string_mul: python repetition, negative → empty, both orders") {
    val rows = golden("ops_string_mul.tsv")
      .map(r => (r(0).replace("\\t", "\t"), r(1).toInt, r(2)))
    val df = rows.toDF("s", "n", "enc")
    val produced = df.select(col("enc"), col("s").str.mul(col("n")).as("r"))
      .select(col("enc"), col("r"), length(col("r")).as("len"),
        md5(col("r").cast("binary")).as("md5"))
      .collect()
    for (row <- produced) {
      val enc = row.getString(0)
      if (enc.startsWith("lit:")) assert(row.getString(1) == enc.drop(4))
      else {
        val Array(_, len, _, digest) = enc.split(":")
        assert(row.getInt(2).toLong == len.toLong && row.getString(3) == digest, enc.take(40))
      }
    }
    // reversed operand order (int column * str column) — same kernel
    val rev = Seq((3, "ab")).toDF("n", "s").select(col("s").str.mul(col("n"))).collect().head
    assert(rev.getString(0) == "ababab")
  }

  test("& and | are LAZY: a raising right side is skipped when the left decides (test_and_or_are_lazy)") {
    val t = Seq((1L, 0L), (3L, 2L), (6L, 3L)).toDF("a", "b")
    val out = t.select(
      ((col("b") =!= 0) && (col("a").floorDiv(col("b")) > 1)).as("x"),
      ((col("b") === 0) || (col("a").floorDiv(col("b")) > 1)).as("y"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1))).toSet
    assert(out == Set((false, true), (false, false), (true, true)))
  }

  test("int operator matrix replays test_int / test_int_pow_shift (numpy goldens)") {
    val rows = golden("ops_int.tsv").map(r => (r(0).toLong, r(1).toLong, r(2), r(3).toLong))
    for ((op, group) <- rows.groupBy(_._3)) {
      val df = group.map(r => (r._1, r._2, r._4)).toDF("a", "b", "expected")
      val actual: Column = op match {
        case "floordiv" => col("a").floorDiv(col("b"))
        case "mod" => col("a").pyMod(col("b"))
        case "truediv_bits" =>
          GraftTestBits.bitsOf(col("a").pyDiv(col("b")))
        case "and" => col("a").bitwiseAND(col("b"))
        case "or" => col("a").bitwiseOR(col("b"))
        case "xor" => col("a").bitwiseXOR(col("b"))
        case "pow" => col("a").intPow(col("b"))
        case "lshift" => col("a") << col("b")
        case "rshift" => col("a") >> col("b")
      }
      val bad = df.select(col("a"), col("b"), col("expected"), actual.as("actual"))
        .filter(!(col("actual") <=> col("expected"))).collect()
      assert(bad.isEmpty, s"$op mismatches: ${bad.take(5).mkString("; ")}")
    }
  }

  test("float and mixed int/float matrices replay test_float / test_mixed_int_float (bit-exact)") {
    val rows = golden("ops_float.tsv").map(r => (r(0).toLong, r(1).toLong, r(2), r(3).toLong))
    for ((op, group) <- rows.groupBy(_._3)) {
      val df = group.map(r => (r._1, r._2, r._4)).toDF("abits", "bbits", "expected")
      val mixed = op.startsWith("mixed_")
      val a: Column = if (mixed) col("abits") else GraftTestBits.fromBits(col("abits"))
      val b: Column = GraftTestBits.fromBits(col("bbits"))
      val actual: Column = op.stripPrefix("mixed_") match {
        case "floordiv" => a.floorDiv(b)
        case "mod" => a.pyMod(b)
        case "truediv" => a.pyDiv(b)
      }
      val bad = df.select(col("abits"), col("bbits"), col("expected"),
          GraftTestBits.bitsOf(actual).as("actual"))
        .filter(!(col("actual") <=> col("expected"))).collect()
      assert(bad.isEmpty, s"$op mismatches: ${bad.take(5).mkString("; ")}")
    }
  }

  test("division by zero errors like the reference (int and float, all three division ops)") {
    def err(f: => Unit): Unit = {
      val e = intercept[Exception](f)
      assert(e.getMessage.contains("division by zero"), e.getMessage)
    }
    val ints = Seq((1L, 0L), (10000L, 0L), (-1L, 0L), (0L, 0L), (-9829480L, 0L)).toDF("a", "b")
    err(ints.select(col("a").floorDiv(col("b"))).collect())
    err(ints.select(col("a").pyMod(col("b"))).collect())
    err(ints.select(col("a").pyDiv(col("b"))).collect())
    val floats = Seq((1.5, 0.0), (-1.5, 0.0)).toDF("a", "b")
    err(floats.select(col("a").floorDiv(col("b"))).collect())
    err(floats.select(col("a").pyMod(col("b"))).collect())
    err(floats.select(col("a").pyDiv(col("b"))).collect())
  }

  test("floor semantics on negatives: the exact python sign table") {
    // the (-10, -3) (-10, 3) (10, -3) (10, 3) corners, plus i64-range exactness
    val rows = Seq((-10L, -3L), (-10L, 3L), (10L, -3L), (10L, 3L)).toDF("a", "b")
      .select(col("a"), col("b"), col("a").floorDiv(col("b")).as("fd"),
        col("a").pyMod(col("b")).as("m"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(rows == Map(
      (-10L, -3L) -> ((3L, -1L)), (-10L, 3L) -> ((-4L, 2L)),
      (10L, -3L) -> ((-4L, -2L)), (10L, 3L) -> ((3L, 1L))))
    // previous double-based floorDiv would corrupt this: exact past 2^53
    val big = Seq((9007199254740995L, 2L)).toDF("a", "b")
      .select(col("a").floorDiv(col("b"))).head.getLong(0)
    assert(big == 4503599627370497L)
  }

  test("coalesce is LAZY: the error branch never evaluates when the first arg is non-null (test_lazy_coalesce)") {
    // pw.coalesce(col, col // 0) must not raise — with floorDiv now erroring
    // on zero divisors, this pins Coalesce's short-circuit contract
    val t = Seq(1L, 2L, 3L).toDF("c")
    val out = t.select(coalesce(col("c"), col("c").floorDiv(lit(0L))).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("cast to bool is python truthiness: empty/zero false, EVERYTHING else true (test_cast)") {
    val strs = Seq("", "False", "True", "12", "abc").toDF("a")
      .select(col("a").castBoolPy).collect().map(_.getBoolean(0)).toSeq
    assert(strs == Seq(false, true, true, true, true)) // "False" is TRUE (non-empty)
    val ints = Seq(0L, 1L, -2L).toDF("a")
      .select(col("a").castBoolPy).collect().map(_.getBoolean(0)).toSeq
    assert(ints == Seq(false, true, true))
    val dbls = Seq(0.0, -0.0, 0.5).toDF("a")
      .select(col("a").castBoolPy).collect().map(_.getBoolean(0)).toSeq
    assert(dbls == Seq(false, false, true))
  }

  test("** type-routes: integral ** integral is exact wrapping i64 pow, float path is powf") {
    val ints = Seq((23L, 13L)).toDF("a", "b")
      .select((col("a") ** col("b")).as("p")).head
    assert(ints.getLong(0) == 504036361936467383L) // double pow rounds this
    // negative exponent replicates the reference's `r as u32` wrap
    assert(Seq((2L, -1L)).toDF("a", "b").select(col("a") ** col("b"))
      .head.getLong(0) == 0L)
    assert(Seq((-1L, -1L)).toDF("a", "b").select(col("a") ** col("b"))
      .head.getLong(0) == -1L) // odd wrapped exponent keeps the sign
    val dbl = Seq((2.0, 10L)).toDF("a", "b")
      .select((col("a") ** col("b")).as("p")).head.getDouble(0)
    assert(dbl == 1024.0)
  }
}

/** double ⇄ IEEE-754 bit pattern helpers for the golden compares (test-side
  * comparator only — the product code stays UDF-free). */
object GraftTestBits {
  import org.apache.spark.sql.functions.udf
  private val toBits = udf((d: Double) => java.lang.Double.doubleToRawLongBits(d))
  private val fromB = udf((l: Long) => java.lang.Double.longBitsToDouble(l))
  def bitsOf(c: Column): Column = toBits(c)
  def fromBits(c: Column): Column = fromB(c)
}
