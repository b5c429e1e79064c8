package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.PwTable

/** Replays the engine-relevant members of tests/test_udf.py's fully-async
  * family (:1069-1480): Future-dtype columns pass through projections, are
  * rejected with the reference's exact messages everywhere else, and
  * `await_futures()` lifts the gate. */
class FutureGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def futureTable: PwTable = {
    val t = PwTable.fromAllColumns(Seq(1L, 2L, 3L).toDF("a"))
    t.withFullyAsync("ret", t("a") + 1, "int")
  }

  private def msgOf(body: => Any): String =
    intercept[IllegalArgumentException](body).getMessage

  test("a FOREIGN table's future column used as a key still raises (the " +
      "gated table has no future field — the schema short-circuit alone " +
      "would wave it through, r19 review)") {
    val t = futureTable
    val clean = PwTable.fromAllColumns(Seq(1L, 2L).toDF("k"))
    val m = msgOf(clean.groupby("g" -> t("ret")))
    assert(m.contains("is not allowed here") && m.contains("await_futures"), m)
  }

  test("a FOREIGN table's future column hidden INSIDE a computation still " +
      "raises — the lazy node tree is walked without analysis, so the " +
      "opaque function-application leaf cannot hide it (r19 advice)") {
    val t = futureTable
    val clean = PwTable.fromAllColumns(Seq(1L, 2L).toDF("k"))
    val m = msgOf(clean.groupby("g" -> upper(t("ret").cast("string"))))
    assert(m.contains("is not allowed here") && m.contains("await_futures"), m)
  }

  test("test_fully_async_udf: the future column's values are correct") {
    val t = futureTable
    assert(t.select("ret" -> t("ret")).toDf.as[Long].collect().sorted.toSeq
      == Seq(2L, 3L, 4L))
  }

  test("test_fully_async_udf_propagation_allowed: bare pass-through beside " +
      "computed columns") {
    val t = futureTable
    val out = t.select("a" -> (t("a") + 2), "b" -> t("ret"))
      .toDf.as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((3L, 2L), (4L, 3L), (5L, 4L)))
  }

  test("test_future_dtype_disallowed_expression: binary add raises verbatim") {
    val t = futureTable
    assert(msgOf(t.select("ret" -> (t("ret") + 1))) ==
      "Pathway does not support using binary operator add on columns of " +
      "types _asyncio.Future[int], <class 'int'>.")
  }

  test("test_future_dtype_disallowed_reduce: sum names the reducer") {
    val t = futureTable
    assert(msgOf(t.groupby("g" -> lit(1)).reduce("s" -> sum(t("ret")))) ==
      "Cannot perform pathway.reducers.sum when column of type " +
      "_asyncio.Future[int] is involved. Consider applying " +
      "`await_futures()` to the table used here")
  }

  test("test_future_dtype_disallowed_in_groupby") {
    val t = futureTable
    assert(msgOf(t.groupby("ret" -> t("ret"))) ==
      "Using column of type _asyncio.Future[int] is not allowed here. " +
      "Consider applying `await_futures()` to the table first.")
  }

  test("test_future_dtype_disallowed_in_sort_key and _in_sort_instance") {
    val t = futureTable
    val expect = "Using column of type _asyncio.Future[int] is not allowed " +
      "here. Consider applying `await_futures()` to the table first."
    assert(msgOf(t.sortWithPrevNext(Seq(t("ret")), lit(1))) == expect)
    assert(msgOf(t.sortWithPrevNext(Seq(t("a")), t("ret"))) == expect)
  }

  test("test_future_dtype_disallowed_in_deduplicate (+instance form)") {
    val t = futureTable
    val expect = "Using column of type _asyncio.Future[int] is not allowed " +
      "here. Consider applying `await_futures()` to the table first."
    assert(msgOf(t.deduplicate(Seq(lit(1)), t("ret"))) == expect)
    assert(msgOf(t.deduplicate(Seq(t("ret")), t("a"))) == expect)
  }

  test("test_future_dtype_disallowed_in_expressions: pointer_from form") {
    val t = futureTable
    assert(msgOf(t.withIdFrom(t("ret"))) ==
      "Cannot perform pathway.pointer_from when column of type " +
      "_asyncio.Future[int] is involved. Consider applying " +
      "`await_futures()` to the table used here.")
  }

  test("test_fully_async_udf_expression_allowed_after_await (+reducer)") {
    val t = futureTable.awaitFutures()
    assert(t.select("r" -> (t("ret") + 1)).toDf.as[Long].collect().sorted.toSeq
      == Seq(3L, 4L, 5L))
    assert(t.groupby("g" -> lit(1)).reduce("s" -> sum(t("ret")))
      .toDf.select("s").as[Long].head() == 9L)
  }

  test("future gate covers the remaining use sites: filter, join, cast, " +
      "groupbyCols, diff (r18 review)") {
    val t = futureTable
    val notAllowed = "Using column of type _asyncio.Future[int] is not " +
      "allowed here. Consider applying `await_futures()` to the table first."
    // a bare future column as a filter condition is a USE, not pass-through
    assert(msgOf(t.filter(t("ret") === 2)).startsWith("Pathway does not support"))
    // a computed (non-binary-op) condition takes the "Cannot perform" form
    assert(msgOf(t.filter(t("ret").cast("boolean")))
      .startsWith("Cannot perform this operation when column of type " +
        "_asyncio.Future[int]"))
    val other = PwTable.fromAllColumns(Seq(2L, 3L).toDF("x"))
    assert(msgOf(t.join(other, t("ret") === other("x"))) == notAllowed)
    assert(msgOf(t.castToTypes("ret" ->
      org.apache.spark.sql.types.DoubleType)) == notAllowed)
    assert(msgOf(t.groupbyCols("ret")) == notAllowed)
    assert(msgOf(t.diff(Seq(t("a")), t("ret"), 1, lit(1))) == notAllowed)
  }

  test("awaitFutures strips ONLY the future flag — coexisting metadata survives") {
    val base = Seq(1L, 2L).toDF("a")
    val tagged = base.withMetadata("a",
      new org.apache.spark.sql.types.MetadataBuilder()
        .putBoolean("pw.append_only", true).build())
    val t = PwTable.fromAllColumns(tagged)
    val f = t.withFullyAsync("ret", t("a") + 1, "int")
    // withFullyAsync composes: tag ret with BOTH keys, then await
    val both = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(graft.functions.Futures.metadataFor("int"))
      .putBoolean("pw.append_only", true).build()
    val f2 = PwTable.fromAllColumns(f.toDf.withMetadata("ret", both))
    val awaited = f2.awaitFutures()
    val md = awaited.toDf.schema("ret").metadata
    assert(!md.contains(graft.functions.Futures.Flag), "future flag stripped")
    assert(md.getBoolean("pw.append_only"), "append-only flag preserved")
  }

  test("reduce: a BARE future column still gets the decoded bare-column " +
      "message, not a dtype error (ordering)") {
    val t = futureTable
    val m = msgOf(t.groupby("g" -> lit(1)).reduce("s" -> t("ret")))
    assert(m.startsWith("You cannot use <table1>.ret in this reduce statement."))
  }

  test("test_fully_async_udf_error_propagation: errored input rides through " +
      "the future, fill_error recovers") {
    import graft.functions.{Errors, Exprs}
    // a // b errors on b=0 (division by zero poisons the row's q)
    val base = Errors.tryDiv(Errors.init(Seq((1L, 1L), (2L, 0L), (3L, 1L))
      .toDF("a", "b")), "q", col("a"), col("b"))
    val t = PwTable.fromAllColumns(base)
    val f = t.withFullyAsync("ret", t("q") + 1, "int").awaitFutures()
    // the poisoned value propagates through the async result; fill_error -1
    val out = f.df.select(Exprs.fillError(col("ret"), lit(-1.0)))
      .as[Double].collect().sorted.toSeq
    assert(out == Seq(-1.0, 2.0, 4.0))
    // and the original error record is still attributed to q
    val errs = f.df.select(col(Errors.ErrCol)).collect()
      .flatMap(_.getSeq[org.apache.spark.sql.Row](0)).map(_.getString(0)).toSeq
    assert(errs == Seq("q"))
  }

  test("test_fully_async_udf_chaining: a fully-async UDF may consume a future") {
    val t = futureTable
    val chained = t.withFullyAsync("ret2", t("ret") + 1, "int")
    // both stay gated until awaited
    assert(msgOf(chained.select("x" -> (chained("ret2") + 1))).nonEmpty)
    val awaited = chained.awaitFutures()
    assert(awaited.select("x" -> awaited("ret2")).toDf.as[Long]
      .collect().sorted.toSeq == Seq(3L, 4L, 5L))
  }
}
