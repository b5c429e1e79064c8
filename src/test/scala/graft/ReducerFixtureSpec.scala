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
}
