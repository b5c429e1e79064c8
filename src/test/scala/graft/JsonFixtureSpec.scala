package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Exprs.PwJson

/** Bit-exact replays of the reference's pw.Json coercion matrix
  * (tests/test_json.py; engine JsonToValue at src/engine/expression.rs:780)
  * on the VARIANT mapping: get/default, [] item access, array indexing
  * (incl. the non-pythonic negative-index rule), STRICT as_int/float/str/bool
  * with the reference's error, and flatten.
  *
  * Out of scope by design: the file's pw.Json PYTHON-WRAPPER tests
  * (iter/len/bin/reversed/coerce inside @pw.udf bodies) — those pin the
  * Python object protocol of the wrapper class, not engine column semantics;
  * their Scala analogue is ordinary Scala collection code. */
class JsonFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def J(rows: String*): DataFrame =
    rows.toSeq.toDF("raw").select(PwJson.parse(col("raw")).as("data"))

  /** canonical text of a variant column for comparison; SQL null → "MISSING" */
  private def js(c: Column): Column = coalesce(to_json(c), lit("MISSING"))

  private def strings(df: DataFrame, c: Column): Seq[String] =
    df.select(js(c)).collect().map(_.getString(0)).toSeq

  test("get(key, default) replays the reference matrix (object hit passes JSON null through; everything else defaults)") {
    val in = J(
      """{"a": {"b": 1}}""", """{"a": {"b": null}}""", """{"a": {}}""",
      """{"a": [1, 2, 3]}""", """{"a": 42}""", """{"a": null}""", "{}",
      "[1,2,3]", "null", "1", "\"foo\"")
    val out = strings(in, PwJson.getField(col("data"), "a", PwJson.parse(lit("""{"b": 42}"""))))
    assert(out == Seq("""{"b":1}""", """{"b":null}""", "{}", "[1,2,3]", "42",
      "null", """{"b":42}""", """{"b":42}""", """{"b":42}""", """{"b":42}""", """{"b":42}"""))
  }

  test("[key] chains: missing/non-object/null all flow as JSON null (test_json_get_item)") {
    val in = J(
      """{"a": {"b": 1}}""", """{"a": {"b": null}}""", "{}", """{"a": {}}""",
      """{"a": [1, 2, 3]}""", """{"a": 42}""", """{"a": null}""")
    val out = strings(in,
      PwJson.item(PwJson.item(col("data"), "a"), "b"))
    assert(out == Seq("1", "null", "null", "null", "null", "null", "null"))
  }

  test("dict.get(int index) and array.get(str key) are null (wrong container kind)") {
    val dict = J("""{"a": 1}""")
    assert(strings(dict, PwJson.itemIndex(col("data"), 1)) == Seq("null"))
    val arr = J("""{"a": [1, 2, 3]}""")
    assert(strings(arr, PwJson.item(PwJson.item(col("data"), "a"), "foo")) == Seq("null"))
  }

  test("array index incl. column index; out-of-bounds and NEGATIVE indices are null") {
    val in = Seq((0, """{"field": [1, 2, 3]}"""), (1, """{"field": [4, 5, 6]}"""),
      (2, """{"field": [7, 8, 9]}""")).toDF("index", "raw")
      .select(col("index"), PwJson.parse(col("raw")).as("data"))
    val out = in.select(js(PwJson.itemIndex(
      PwJson.item(col("data"), "field"), col("index"))))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("1", "5", "9"))
    val oob = J("""{"field": [0, 1, 2]}""")
    for (i <- Seq(-1, -4, 3)) {
      assert(strings(oob, PwJson.itemIndex(PwJson.item(col("data"), "field"), i))
        == Seq("null"), s"index $i")
      assert(strings(oob, PwJson.itemIndex(PwJson.item(col("data"), "field"), lit(i)))
        == Seq("null"), s"column index $i")
    }
  }

  test("object keys with dots/spaces/quotes resolve (bracket paths + map fallback)") {
    val in = J("""{"a.b": 1, "with space": 2, "it's": 3, "b\"q'x": 4}""")
    assert(strings(in, PwJson.item(col("data"), "a.b")) == Seq("1"))
    assert(strings(in, PwJson.item(col("data"), "with space")) == Seq("2"))
    assert(strings(in, PwJson.item(col("data"), "it's")) == Seq("3"))
    assert(strings(in, PwJson.item(col("data"), "b\"q'x")) == Seq("4"))
    assert(strings(in, PwJson.item(col("data"), "no.pe")) == Seq("null"))
  }

  test("as_int/as_float/as_str/as_bool replay the strict typing matrix (test_json_as_type)") {
    val ints = J("""{"field": 42}""", """{"field": -1}""", """{"field": null}""", "{}")
      .select(PwJson.asInt(PwJson.item(col("data"), "field")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(ints == Seq(Some(42L), Some(-1L), None, None))

    val floats = J("""{"field": 1.5}""", """{"field": 10}""", """{"field": 0}""",
      """{"field": -1}""", s"""{"field": ${(1L << 32) + 1}}""",
      s"""{"field": ${(1L << 45) + 1}}""", """{"field": null}""", "{}")
      .select(PwJson.asFloat(PwJson.item(col("data"), "field")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(floats == Seq(Some(1.5), Some(10.0), Some(0.0), Some(-1.0),
      Some(((1L << 32) + 1).toDouble), Some(((1L << 45) + 1).toDouble), None, None))

    val strs = J("""{"field": "foo"}""", """{"field": "42"}""", """{"field": "true"}""",
      """{"field": null}""", "{}")
      .select(PwJson.asStr(PwJson.item(col("data"), "field")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getString(0))).toSeq
    assert(strs == Seq(Some("foo"), Some("42"), Some("true"), None, None))

    val bools = J("""{"field": true}""", """{"field": false}""", """{"field": null}""", "{}")
      .select(PwJson.asBool(PwJson.item(col("data"), "field")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0))).toSeq
    assert(bools == Seq(Some(true), Some(false), None, None))
  }

  test("wrong-type conversions raise the reference error (no int/str/bool coercion)") {
    def expectErr(raw: String, f: Column => Column): Unit = {
      val ex = intercept[Exception] {
        J(raw).select(f(PwJson.item(col("data"), "field"))).collect()
      }
      assert(ex.getMessage.contains("Cannot convert json"), s"$raw: ${ex.getMessage}")
    }
    for (v <- Seq("\"42\"", "\"foo\"", "1.6", "true"))
      expectErr(s"""{"field": $v}""", PwJson.asInt)
    for (v <- Seq("\"42\"", "\"foo\"", "true"))
      expectErr(s"""{"field": $v}""", PwJson.asFloat)
    for (v <- Seq("1", "1.6", "true"))
      expectErr(s"""{"field": $v}""", PwJson.asStr)
    for (v <- Seq("1", "0", "1.6", "\"1\"", "\"0\"", "\"true\"", "\"True\""))
      expectErr(s"""{"field": $v}""", PwJson.asBool)
  }

  test("mixed-typed object navigation replays test_json_input") {
    val in = J("""{"a": {"field": 1}, "b": 2, "c": 1.5, "d": true, "e": "foo", "f": [1, 2, 3]}""")
    val out = in.select(
      PwJson.asInt(PwJson.item(PwJson.item(col("data"), "a"), "field")).as("a"),
      PwJson.asInt(PwJson.item(col("data"), "b")).as("b"),
      PwJson.asFloat(PwJson.item(col("data"), "c")).as("c"),
      PwJson.asBool(PwJson.item(col("data"), "d")).as("d"),
      PwJson.asStr(PwJson.item(col("data"), "e")).as("e"),
      PwJson.asInt(PwJson.itemIndex(PwJson.item(col("data"), "f"), 1)).as("f")).head
    assert((out.getLong(0), out.getLong(1), out.getDouble(2), out.getBoolean(3),
      out.getString(4), out.getLong(5)) == ((1L, 2L, 1.5, true, "foo", 2L)))
  }

  test("flatten explodes JSON arrays; non-arrays raise the reference error (test_json_flatten)") {
    val in = J("[1, 2]", "[3]", "[4, 5]")
    val out = in.select(explode(PwJson.elements(col("data"))).as("e"))
      .select(PwJson.asInt(col("e"))).collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L, 3L, 4L, 5L))
    for (bad <- Seq("1", "0", "1.6", "\"1\"", "\"0\"", "\"true\"",
        """{"field": [1]}""", "null")) {
      val ex = intercept[Exception] {
        J(bad).select(explode(PwJson.elements(col("data")))).collect()
      }
      assert(ex.getMessage.contains("Pathway can't flatten this Json"),
        s"$bad: ${ex.getMessage}")
    }
  }
}
