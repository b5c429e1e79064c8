package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Keys, PwTable}

/** Bit-exact replays of the reference's core-table fixtures from
  * tests/test_common.py — flatten (empty lists, strings, type error), ix
  * (optional vs the strict KeyError), and concat universe-intersection
  * (r15 decode: strict ix silently dropped dangling pointers, flatten
  * rejected strings, concat never checked disjointness). */
class CoreFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def pw(df: org.apache.spark.sql.DataFrame, idFrom: String): PwTable =
    PwTable.fromPrimaryKey(df, idFrom)

  test("flatten: empty lists vanish, payload duplicates per element (test_flatten)") {
    val t = Seq((1, Seq(1, 2), -1), (2, Seq.empty[Int], -2), (3, Seq(3, 4), -3),
      (4, Seq(10, 11, 12), -4), (5, Seq(4, 5, 6, 1, 2), -5))
      .toDF("k", "array", "other")
    val out = pw(t, "k").flatten("array").toDf
      .select("array", "other").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted
    assert(out == Seq((1, -1), (1, -5), (2, -1), (2, -5), (3, -3), (4, -3),
      (4, -5), (5, -5), (6, -5), (10, -4), (11, -4), (12, -4)).sorted)
  }

  test("flatten: strings explode into characters; non-iterables are rejected (test_flatten_string)") {
    val t = Seq((1, "abc"), (2, "defoimkm"), (3, "xyz")).toDF("k", "string")
    val out = pw(t, "k").flatten("string").toDf
      .select("string").as[String].collect().toSeq.sorted
    assert(out == "abcdefoimkmxyz".toSeq.map(_.toString).sorted)
    val bad = Seq((1, -1)).toDF("a", "other")
    val err = intercept[IllegalArgumentException] {
      pw(bad, "a").flatten("a")
    }
    assert(err.getMessage.contains("Cannot flatten column of type"))
  }

  test("flatten resolves case-insensitively as one canonical name; nested paths error cleanly") {
    // r15 review: resolving the type through the analyzer but exploding by
    // the literal spelling kept the unexploded array inside _rest.*
    val t = Seq((1, Seq(1, 2))).toDF("k", "array")
    val out = pw(t, "k").flatten("ARRAY").toDf
    assert(out.columns.count(_.equalsIgnoreCase("array")) == 1)
    assert(out.select(col("ARRAY")).as[Int].collect().sorted.toSeq == Seq(1, 2))
    val nested = Seq((1, (Seq(1), "x"))).toDF("k", "rec")
    val err = intercept[IllegalArgumentException] {
      pw(nested, "k").flatten("rec._1")
    }
    assert(err.getMessage.contains("no such top-level column"))
  }

  test("ix: optional=true yields nulls for null/missing pointers (test_ix_none)") {
    val animals = pw(Seq((1, "upupa"), (2, "acherontia"), (3, "bubo"),
      (4, "dynastes")).toDF("k", "genus"), "k")
    val birds = Seq((1, "hoopoe", Some(2)), (2, "owl", Some(4)), (3, "brbrb", None))
      .toDF("bk", "desc", "ptr")
      .withColumn("ptr", when(col("ptr").isNotNull, Keys.pointerFrom(col("ptr"))))
    val out = pw(birds, "bk").ix(animals, col("ptr"), optional = true).toDf
      .select(col("desc"), col("genus")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1))).toSet
    assert(out == Set(("hoopoe", "acherontia"), ("owl", "dynastes"), ("brbrb", null)))
  }

  test("ix: a dangling pointer under strict mode fails loudly (test_ix_missing_key)") {
    val animals = pw(Seq((1, "upupa"), (2, "acherontia")).toDF("k", "genus"), "k")
    val birds = Seq((1, "hoopoe", 1), (2, "owl", 3)).toDF("bk", "desc", "ptr")
      .withColumn("ptr", Keys.pointerFrom(col("ptr")))
    val err = intercept[Exception] {
      pw(birds, "bk").ix(animals, col("ptr")).toDf.collect()
    }
    assert(SparkTestBase.causeMessages(err).exists(_.contains("ix: missing key")))
    // and a RESOLVABLE strict lookup passes rows through untouched
    val ok = Seq((1, "hoopoe", 1), (2, "owl", 2)).toDF("bk", "desc", "ptr")
      .withColumn("ptr", Keys.pointerFrom(col("ptr")))
    assert(pw(ok, "bk").ix(animals, col("ptr")).toDf.count() == 2)
  }

  test("concatStrict: intersecting universes fail loudly (test_concat_errors_on_intersecting_universes)") {
    val a = pw(Seq((1, "a"), (2, "b")).toDF("k", "v"), "k")
    val b = pw(Seq((2, "c"), (3, "d")).toDF("k", "v"), "k") // id 2 collides
    val err = intercept[Exception] { a.concatStrict(b).toDf.collect() }
    assert(SparkTestBase.causeMessages(err).exists(_.contains("intersecting universes")))
    // disjoint ids pass with every row kept
    val c = pw(Seq((3, "c"), (4, "d")).toDF("k", "v"), "k")
    assert(a.concatStrict(c).toDf.count() == 4)
  }
}
