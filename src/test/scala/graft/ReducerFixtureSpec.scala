package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Reducers

/** Bit-exact replays of the reference's reducer edge-case fixtures from
  * tests/test_common.py — argmin/argmax tie rules (reduce.rs:469/504),
  * unique-vs-Error, and tuple/sorted_tuple None handling (r15 decode;
  * the argmax tie previously resolved to the LARGEST key and diverged). */
class ReducerFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def people = Seq((1, "Charlie", 18), (2, "Alice", 18), (3, "Bob", 18),
    (4, "David", 19), (5, "Erin", 19), (6, "Frank", 20)).toDF("id", "name", "age")

  test("argmin/argmax tie resolves to the smallest key (test_argmin_argmax_tie)") {
    // grouped by age every group is all-ties: both argmin and argmax pick
    // the row with the smallest id (reference ArgMax keeps (value,
    // Reverse(key)) — ties go to the SMALLEST key, same as ArgMin)
    val out = people.groupBy("age").agg(
      Reducers.argmin(col("name"), col("age"), col("id")).as("mn"),
      Reducers.argmax(col("name"), col("age"), col("id")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((18, "Charlie", "Charlie"), (19, "David", "David"),
      (20, "Frank", "Frank")))
  }

  test("argmin/argmax over another column ties by that column (test_argmin_argmax_different_column)") {
    val out = people.agg(
      Reducers.argmin(col("name"), col("age"), col("name")).as("mn"),
      Reducers.argmax(col("name"), col("age"), col("name")).as("mx"))
      .collect().map(r => (r.getString(0), r.getString(1))).head
    // min age 18 ties {Charlie, Alice, Bob} → Alice (smallest name);
    // max age 20 is unique → Frank
    assert(out == (("Alice", "Frank")))
    // and a tie on the MAX side: ages 19 {David, Erin} → David
    val mx19 = people.filter(col("age") <= 19).agg(
      Reducers.argmax(col("name"), col("age"), col("name"))).head.getString(0)
    assert(mx19 == "David")
  }

  test("argmax ordering guards: null values never win, NaN counts as largest") {
    // r15 review: a bare min_by over -value would invert null ordering
    // (nulls-first would WIN) and lose NaN-is-largest
    val withNull = Seq((1, "a", Some(5.0)), (2, "b", None), (3, "c", Some(3.0)))
      .toDF("id", "name", "v")
    assert(withNull.agg(Reducers.argmax(col("name"), col("v"), col("name")))
      .head.getString(0) == "a")
    val allNull = Seq((1, "a", None: Option[Double]), (2, "b", None)).toDF("id", "name", "v")
    assert(allNull.agg(Reducers.argmax(col("name"), col("v"), col("name")))
      .head.getString(0) == "a") // whole-group null: smallest tieBreak
    val withNan = Seq((1, "a", 5.0), (2, "b", Double.NaN), (3, "c", 3.0))
      .toDF("id", "name", "v")
    assert(withNan.agg(Reducers.argmax(col("name"), col("v"), col("name")))
      .head.getString(0) == "b") // NaN ranks largest, like max_by and the Rust order
  }

  test("unique: single value per group passes, mixed group errors (test_unique)") {
    val pets = Seq(("dog", "Bob", 10), ("cat", "Alice", 9), ("cat", "Alice", 8),
      ("dog", "Bob", 7), ("foo", "Charlie", 6)).toDF("pet", "owner", "age")
    val ok = pets.groupBy("pet").agg(Reducers.unique(col("owner")).as("owner"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(ok == Set(("dog", "Bob"), ("cat", "Alice"), ("foo", "Charlie")))
    val err = intercept[Exception] {
      pets.groupBy("pet").agg(Reducers.unique(col("age")).as("age")).collect()
    }
    assert(err.getMessage.contains("unique") ||
      Option(err.getCause).exists(_.getMessage.contains("unique")))
  }

  test("tuple/sorted_tuple None handling replays the reference vectors (test_tuple_reducer)") {
    val t = Seq((3, "valA", Some(-1)), (2, "valA", Some(1)), (5, "valA", None),
      (4, "valB", Some(4)), (6, "valB", Some(4)), (1, "valB", Some(7)))
      .toDF("id", "colA", "colB")
    def lists(c: org.apache.spark.sql.Column): Map[String, List[Option[Int]]] =
      t.groupBy("colA").agg(c.as("l")).collect()
        .map(r => r.getString(0) ->
          r.getSeq[Any](1).toList.map(Option(_).map(_.asInstanceOf[Int]))).toMap
    // tuple(skip_nones=False): row-id order, None kept in place
    assert(lists(Reducers.tupleInOrder(col("id"), col("colB"))) ==
      Map("valA" -> List(Some(1), Some(-1), None),
        "valB" -> List(Some(7), Some(4), Some(4))))
    // tuple(skip_nones=True)
    assert(lists(Reducers.tupleInOrderSkipNones(col("id"), col("colB"))) ==
      Map("valA" -> List(Some(1), Some(-1)),
        "valB" -> List(Some(7), Some(4), Some(4))))
    // sorted_tuple(skip_nones=False): None sorts FIRST
    assert(lists(Reducers.sortedTupleKeepNones(col("colB"))) ==
      Map("valA" -> List(None, Some(-1), Some(1)),
        "valB" -> List(Some(4), Some(4), Some(7))))
    // sorted_tuple(skip_nones=True)
    assert(lists(Reducers.sortedTuple(col("colB"))) ==
      Map("valA" -> List(Some(-1), Some(1)),
        "valB" -> List(Some(4), Some(4), Some(7))))
  }

  // ───────────── tests/test_reducers.py (r16 decode) ─────────────

  private def pets = Seq(("dog", "Alice", 10L), ("dog", "Bob", 9L),
    ("cat", "Alice", 8L), ("dog", "Bob", 7L)).toDF("pet", "owner", "age")

  test("custom count accumulator replays test_custom_count_static / test_stateful_single_nullary") {
    val cnt = udaf(Reducers.statefulSingle[Long, Long, Long](0L)((s, _) => s + 1L)(_ + _)(identity)(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
    val out = pets.groupBy("pet").agg(cnt(lit(1L)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("dog" -> 3L, "cat" -> 1L))
  }

  test("stateful unary/binary replay test_stateful_single_unary/_binary (lens 11/5, 98/40)") {
    val lens = udaf(Reducers.statefulSingle[String, Long, Long](0L)(
      (s, v) => s + v.length)(_ + _)(identity)(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
    val out = pets.groupBy("pet").agg(lens(col("owner")).as("lens"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("dog" -> 11L, "cat" -> 5L))
    val lens2 = udaf(Reducers.statefulSingle[(String, Long), Long, Long](0L)(
      (s, v) => s + v._1.length * v._2)(_ + _)(identity)(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
    val out2 = pets.groupBy("pet").agg(lens2(col("owner"), col("age")).as("lens"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out2 == Map("dog" -> 98L, "cat" -> 40L))
  }

  test("custom mean/stdev accumulator replays test_custom_mean_stdev") {
    val ms = udaf(Reducers.statefulSingle[Double, (Double, Double, Long), (Double, Double)](
      (0.0, 0.0, 0L))((s, a) => (s._1 + a, s._2 + a * a, s._3 + 1))(
      (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))(s => {
        val mean = s._1 / s._3
        (mean, math.sqrt(s._2 / s._3 - mean * mean))
      })(
      org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong),
      org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaDouble)))
    val withCat = Seq(("cat", 10.0), ("dog", 9.0), ("cat", 8.0), ("dog", 7.0))
      .toDF("pet", "age")
    val out = withCat.groupBy("pet").agg(ms(col("age")).as("r"))
      .select(col("pet"), col("r._1").as("mean"), col("r._2").as("stdev"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(out == Set(("dog", 8.0, 1.0), ("cat", 9.0, 1.0)))
  }

  test("udf_reducer with sort_by folds in event-time order (test_custom_sorting: 58/41)") {
    // result = fold over rows sorted by t: acc*factor + summand, acc0 = f0+s0
    val t = Seq((1, 3L, 1L, 1), (1, 2L, -1L, 2), (1, 2L, -2L, 4), (1, 4L, 2L, 3),
      (2, -1L, 2L, 1), (2, 5L, 1L, 2), (2, 3L, 2L, 3), (2, 2L, 1L, 4))
      .toDF("i", "a", "b", "t")
    val out = t.groupBy("i").agg(
      Reducers.foldInOrder(col("t"), struct(col("a"), col("b")))(
        first => first.getField("a") + first.getField("b"))(
        (acc, row) => acc * row.getField("a") + row.getField("b")).as("result"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(out == Map(1 -> 58L, 2 -> 41L))
  }

  test("count_distinct over 0/1/2 columns replays test_distinct (1/3/4/5)") {
    val t = Seq((1, 2), (3, 4), (3, 5), (5, 5), (5, 6)).toDF("a", "b")
    val out = t.agg(
      Reducers.countDistinct_().as("empty"),
      Reducers.countDistinct_(col("a")).as("only_a"),
      Reducers.countDistinct_(col("b")).as("only_b"),
      Reducers.countDistinct_(col("a"), col("b")).as("both")).head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3)) ==
      ((1L, 3L, 4L, 5L)))
    // approximate variant is exact at this cardinality (test_distinct_approximate)
    val outA = t.agg(
      Reducers.countDistinctApproxPrecision(8).as("empty"),
      Reducers.countDistinctApproxPrecision(8, col("a")).as("only_a"),
      Reducers.countDistinctApproxPrecision(8, col("b")).as("only_b"),
      Reducers.countDistinctApproxPrecision(8, col("a"), col("b")).as("both")).head
    assert((outA.getLong(0), outA.getLong(1), outA.getLong(2), outA.getLong(3)) ==
      ((1L, 3L, 4L, 5L)))
  }

  test("count_distinct_approximate meets the reference error bound (test_distinct_approximation_quality)") {
    // deterministic congruential data, 10 groups, ~2000 distinct per group;
    // reference bound: |exact - approx| / exact < 1.8 / 2^(p/2)
    val p = 8
    val df = spark.range(20000).select(
      (col("id") % 10).as("g"),
      ((col("id") * 2654435761L) % 2000).as("a"))
    val rows = df.groupBy("g").agg(
      Reducers.countDistinct_(col("a")).as("cd"),
      Reducers.countDistinctApproxPrecision(p, col("a")).as("cda"))
      .collect()
    val bound = 1.8 / math.pow(2.0, p / 2.0)
    rows.foreach { r =>
      val err = math.abs(r.getLong(1) - r.getLong(2)).toDouble / r.getLong(1)
      assert(err < bound, s"g=${r.get(0)} exact=${r.getLong(1)} approx=${r.getLong(2)}")
    }
  }

  test("sumFloat is Neumaier-compensated like the reference (test_float_sum_precision)") {
    val a = math.pow(10.1, 21)
    val one = math.pow(1.0, 21)
    val df = Seq(-a, -a, one, one, a, a).toDF("v")
    assert(df.agg(Reducers.sumFloat(col("v"))).head.getDouble(0) == 2.0)
    // plain Spark sum loses the small addends on this cancellation — the
    // documented performance-default divergence (SEMANTICS.md)
    assert(df.agg(sum(col("v"))).head.getDouble(0) != 2.0)
    // and over many partitions the compensated merge still holds
    val big = df.repartition(4)
    assert(big.agg(Reducers.sumFloat(col("v"))).head.getDouble(0) == 2.0)
  }

  test("sumFloat null semantics match Spark sum: nulls skipped, all-null group is NULL") {
    val df = Seq(Some(1.5), None, Some(2.5), None).toDF("v")
    assert(df.agg(Reducers.sumFloat(col("v"))).head.getDouble(0) == 4.0)
    val allNull = Seq(None: Option[Double], None).toDF("v")
    assert(allNull.agg(Reducers.sumFloat(col("v"))).head.isNullAt(0))
    assert(allNull.agg(sum(col("v"))).head.isNullAt(0)) // parity with Spark sum
  }

  test("non-append-only final state replays test_non_append_only_reducers (batch mapping)") {
    // after all retractions: instance 1 = {3(src 2), 10(src 5)}, instance 2 = {1(src 4)}
    val t = Seq((1, 3L, 2L), (2, 1L, 4L), (1, 10L, 5L)).toDF("instance", "value", "source")
    val out = t.groupBy("instance").agg(
      min(col("value")).as("min"),
      Reducers.argmin(col("source"), col("value"), col("source")).as("source_min"),
      max(col("value")).as("max"),
      Reducers.argmax(col("source"), col("value"), col("source")).as("source_max"),
      sum(col("value")).as("sum_i"),
      Reducers.sumFloat(col("value") + lit(0.5)).as("sum_f"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(out(1) == ((3L, 2L, 10L, 5L, 13L, 14.0)))
    assert(out(2) == ((1L, 4L, 1L, 4L, 1L, 1.5)))
  }

  test("argmax widens integral values: a MinValue sentinel cannot rank as the maximum") {
    // r15 ADVICE: -Long.MinValue overflows back onto itself under non-ANSI
    // mode, so a bare negation ranked the sentinel as the group maximum.
    // WidenedNeg casts integral inputs to decimal(20,0) first.
    val longs = Seq(("sentinel", Long.MinValue), ("real_max", 7L), ("mid", 3L))
      .toDF("name", "v")
    assert(longs.agg(Reducers.argmax(col("name"), col("v"), col("name")))
      .head.getString(0) == "real_max")
    assert(longs.agg(Reducers.argmin(col("name"), col("v"), col("name")))
      .head.getString(0) == "sentinel")
    val ints = Seq(("sentinel", Int.MinValue), ("real_max", -1)).toDF("name", "v")
    assert(ints.agg(Reducers.argmax(col("name"), col("v"), col("name")))
      .head.getString(0) == "real_max")
    // doubles stay on the unwidened path: huge magnitudes still rank exactly
    val dbls = Seq(("lo", -1.7e308), ("hi", 1.7e308)).toDF("name", "v")
    assert(dbls.agg(Reducers.argmax(col("name"), col("v"), col("name")))
      .head.getString(0) == "hi")
  }
}
