package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PwTable
import graft.operators.AsyncTransformer

/** Replay of `python/pathway/tests/test_error_messages.py` (749 LoC) — the
  * API-misuse message surface. Only the vectors with a semantic (not
  * Python-syntactic) cause are representable: string-vs-ColumnReference,
  * `pw.this` mechanics, TableSlice, and row-transformer tracebacks are
  * Python-frontend shapes that the Scala API prevents at compile time
  * (documented in SEMANTICS.md). The decoded runtime contracts are pinned
  * here with the reference's EXACT texts.
  */
class ErrorMessageFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def pets = PwTable.fromPrimaryKey(
    Seq((1, "Alice", 10), (1, "Bob", 9), (2, "Alice", 8), (1, "Bob", 7))
      .toDF("pet", "owner", "age"), "pet", "owner", "age")

  test("groupby(id=) with a different single grouping column carries the " +
      "reference message (test_error_messages.py:579)") {
    val e = intercept[IllegalArgumentException] {
      pets.groupbyCols("age").reduceWithId("pet", "pet" -> first(col("pet")))
    }
    assert(e.getMessage ==
      "Table.groupby() received id argument and is grouped by a single column," +
        " but the arguments are not equal.\n" +
        "Consider using <table>.groupby(id=...), skipping the positional argument.")
  }

  test("groupby(id=) with multiple grouping columns carries the reference " +
      "message (test_error_messages.py:591)") {
    val e = intercept[IllegalArgumentException] {
      pets.groupbyCols("age", "pet").reduceWithId("pet", "pet" -> first(col("pet")))
    }
    assert(e.getMessage ==
      "Table.groupby() cannot have id argument when grouping by multiple columns.")
  }

  test("groupby(id=) happy path still works: pointer column becomes the id " +
      "(test_error_messages.py:553 positive vector)") {
    val t = PwTable.fromPrimaryKey(
      Seq((1, "Alice", 10), (1, "Bob", 9), (2, "Alice", 8), (1, "Bob", 7))
        .toDF("pet", "owner", "age"), "pet", "owner", "age")
    val keyed = t.withColumns("petptr" -> graft.core.Keys.pointerFrom(col("pet")))
    val res = keyed.groupbyCols("petptr")
      .reduceWithId("petptr", "agesum" -> sum(col("age")))
    val got = res.toDf.select("agesum").as[Long].collect().toSet
    assert(got == Set(26L, 8L))
  }

  test("update_cells with extra columns carries the reference message " +
      "(test_error_messages.py:602)") {
    val left = PwTable.fromPrimaryKey(
      Seq((1, "Alice"), (1, "Bob")).toDF("pet", "owner"), "pet", "owner")
    val right = PwTable.fromPrimaryKey(
      Seq((1, "Alice", 10), (1, "Bob", 9)).toDF("pet", "owner", "age"),
      "pet", "owner")
    val e = intercept[IllegalArgumentException] { left.updateCells(right) }
    assert(e.getMessage == "Columns of the argument in Table.update_cells() " +
      "not present in the updated table: ['age'].")
  }

  test("a bare non-grouped column in reduce carries the reference message " +
      "(test_error_messages.py:457)") {
    val purchases = PwTable.fromPrimaryKey(
      Seq((1, 1, "user1@example.com", 15), (2, 2, "user2@example.com", 18))
        .toDF("purchase_id", "user_id", "email", "amount"), "purchase_id")
    val e = intercept[IllegalArgumentException] {
      purchases.groupbyCols("user_id").reduce(
        "user_id" -> col("user_id"),
        "email" -> col("email"),
        "total_amount" -> sum(col("amount")))
    }
    assert(e.getMessage ==
      "You cannot use <table1>.email in this reduce statement.\n" +
        "Make sure that <table1>.email is used in a groupby or wrap it with " +
        "a reducer, e.g. pw.reducers.count(<table1>.email)")
  }

  test("restrict with a non-subset universe fails at runtime with " +
      "'key missing in output table' (test_error_messages.py:723)") {
    val t1 = PwTable.fromPrimaryKey(Seq((6, 2)).toDF("a", "b"), "a")
    val t2 = PwTable.fromPrimaryKey(Seq(2).toDF("c"), "c")
    val e = intercept[Exception] { t1.restrictStrict(t2).toDf.collect() }
    assert(SparkTestBase.causeMessages(e).exists(_.contains("key missing in output table")))
    // subset case passes through
    val t3 = PwTable.fromPrimaryKey(Seq(6).toDF("a"), "a")
    assert(t1.restrictStrict(t3).toDf.collect().map(_.getInt(0)).toSeq == Seq(6))
  }

  test("AsyncTransformer invoke-arg validation texts match the reference " +
      "(test_error_messages.py-family contract, test_async_transformer.py:391)") {
    // same message family lives on the AsyncTransformer seam — pinned here
    // as the error-message index for SEMANTICS.md
    val e = intercept[IllegalArgumentException] {
      AsyncTransformer.validateInvokeArgs(Seq("a", "b"), Seq("a"))
    }
    assert(e.getMessage.startsWith("Input table has a column 'b'"))
  }

  test("ix with a dangling pointer fails with the reference's missing-key " +
      "runtime error (test_error_messages.py ix contract)") {
    val base = PwTable.fromPrimaryKey(Seq((1, "x")).toDF("k", "v"), "k")
    val probe = PwTable.fromPrimaryKey(Seq(99).toDF("k"), "k")
    val e = intercept[Exception] {
      probe.ix(base.rename("k" -> "_bk"), graft.core.Keys.pointerFrom(col("k")))
        .toDf.collect()
    }
    assert(SparkTestBase.causeMessages(e).exists(_.contains("ix: missing key")))
  }
}
