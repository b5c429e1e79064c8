package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Errors
import graft.operators.ErrorOps
import graft.operators.ErrorOps.{Agg, WithLog}

/** Replays the reference's error-propagation fixtures (tests/test_errors.py)
  * against the ErrorOps checked operators in non-terminate mode: Error
  * values skip filter/join/groupby rows with the reference's exact log
  * messages, outer joins keep error-keyed rows unmatched, reducers skip or
  * propagate errored inputs by `_skip_errors`, duplicate keys poison whole
  * rows, and fill_error/remove_errors recover. Values compared exactly;
  * log KEYS print as values instead of the reference's pointer hashes
  * (documented in ErrorOps). */
class ErrorFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  import Errors.ErrCol

  private def rows(df: DataFrame, cols: String*): Set[Seq[Any]] =
    df.select(cols.map(col): _*).collect().map(_.toSeq.toList: Seq[Any]).toSet
  private def logMsgs(df: DataFrame): Seq[String] =
    df.collect().map(_.getString(0)).toSeq.sorted

  test("test_division_by_zero: // errors route to the accumulator; fill_error recovers") {
    val t1 = Errors.init(Seq((3L, 3L, 1L), (4L, 0L, 2L), (5L, 5L, 0L), (6L, 2L, 3L))
      .toDF("a", "b", "c"))
    val t2 = ErrorOps.floorDivChecked(t1, "x", col("a"), col("b"))
    val t4 = ErrorOps.floorDivChecked(t2, "y", col("a"), col("c"))
    val filled = Errors.fillError(Errors.fillError(t4, "x", lit(-1L)), "y", lit(-1L))
    assert(rows(filled, "a", "x", "y") == Set(
      Seq(3L, 1L, 3L), Seq(4L, -1L, 2L), Seq(5L, 1L, -1L), Seq(6L, 3L, 2L)))
    // the global-log slice: one "division by zero" per errored cell
    assert(logMsgs(ErrorOps.logOf(t4, "x").unionByName(ErrorOps.logOf(t4, "y"))) ==
      Seq("division by zero", "division by zero"))
  }

  test("test_filter_with_error_in_condition: errored condition skips the row + logs") {
    val t1 = Errors.init(Seq((6L, 2L), (5L, 5L), (4L, 0L), (3L, 3L)).toDF("a", "b"))
    val t2 = ErrorOps.floorDivChecked(t1, "x", col("a"), col("b"))
    val WithLog(res, log) = ErrorOps.filterChecked(t2, col("x") > 0, Seq("x"))
    assert(rows(res, "a", "b", "x") == Set(
      Seq(3L, 3L, 1L), Seq(5L, 5L, 1L), Seq(6L, 2L, 3L)))
    assert(logMsgs(log) == Seq(ErrorOps.FilterSkip))
  }

  test("test_filter_with_error_in_other_column: the error rides along") {
    val t1 = Errors.init(Seq((3L, 3L), (4L, 0L), (5L, 5L), (6L, 2L)).toDF("a", "b"))
    val t2 = ErrorOps.floorDivChecked(t1, "x", col("a"), col("b"))
    val WithLog(res, log) = ErrorOps.filterChecked(t2, col("a") > 0, Seq("a"))
    val filled = Errors.fillError(res, "x", lit(-1L))
    assert(rows(filled, "a", "b", "x") == Set(
      Seq(3L, 3L, 1L), Seq(4L, 0L, -1L), Seq(5L, 5L, 1L), Seq(6L, 2L, 3L)))
    assert(log.count() == 0)
  }

  test("test_inner_join_with_error_in_condition: errored key skipped + logged") {
    val t1 = ErrorOps.floorDivChecked(
      Errors.init(Seq((1L, 1L), (2L, 0L), (3L, 1L)).toDF("a", "c")),
      "a", col("a"), col("c"))
    val t2 = Seq(1L, 1L, 2L).toDF("b")
    val WithLog(res, log) = ErrorOps.joinChecked(t1, t2, Seq("a" -> "b"), "inner")
    assert(rows(res, "a", "c", "b") == Set(Seq(1L, 1L, 1L)))
    assert(res.count() == 2) // two matches against b=1, identical payload
    assert(logMsgs(log) == Seq(ErrorOps.JoinSkip))
  }

  test("test_left_join_with_error_in_condition: errored key kept UNMATCHED") {
    val t1 = ErrorOps.floorDivChecked(
      Errors.init(Seq((1L, 1L), (2L, 0L), (3L, 1L)).toDF("a", "c")),
      "a", col("a"), col("c"))
    val t2 = Seq(1L, 1L, 1L, 2L).toDF("b")
    val WithLog(res, log) = ErrorOps.joinChecked(t1, t2, Seq("a" -> "b"), "left")
    val filled = Errors.fillError(res, "a", lit(-1L))
    assert(filled.count() == 5)
    assert(rows(filled, "a", "c", "b") == Set(
      Seq(1L, 1L, 1L), Seq(-1L, 0L, null), Seq(3L, 1L, null)))
    assert(logMsgs(log) == Seq(ErrorOps.JoinSkip))
  }

  test("clean None keys MATCH each other (value equality, not SQL three-valued)") {
    val l = Errors.init(Seq[(Option[Long], String)]((Some(1L), "a"), (None, "n"))
      .toDF("k", "lv"))
    val r = Seq[(Option[Long], String)]((Some(1L), "x"), (None, "y")).toDF("k2", "rv")
    val WithLog(res, _) = ErrorOps.joinChecked(l, r, Seq("k" -> "k2"), "inner")
    assert(rows(res, "lv", "rv") == Set(Seq("a", "x"), Seq("n", "y")))
  }

  test("test_remove_errors: clean rows survive, accumulator drops") {
    val t1 = Errors.init(Seq((3L, 3L, 1L), (4L, 0L, 2L), (5L, 5L, 0L), (6L, 2L, 3L))
      .toDF("a", "b", "c"))
    val t4 = ErrorOps.floorDivChecked(
      ErrorOps.floorDivChecked(t1, "x", col("a"), col("b")),
      "y", col("a"), col("c"))
    val res = Errors.removeErrors(t4.select("a", "x", "y", ErrCol))
    assert(rows(res, "a", "x", "y") == Set(Seq(3L, 1L, 3L), Seq(6L, 3L, 2L)))
  }

  test("test_groupby_with_error_in_grouping_column: errored keys skip rows + log") {
    val t1 = Errors.init(
      Seq((3L, 3L, 1L), (4L, 0L, 2L), (5L, 5L, 0L), (6L, 2L, 3L), (6L, 6L, 2L))
        .toDF("a", "b", "c"))
    val t2 = ErrorOps.floorDivChecked(
      ErrorOps.floorDivChecked(t1, "x", col("a"), col("b")),
      "y", col("a"), col("c"))
    val WithLog(res, log) = ErrorOps.reduceChecked(t2, Seq("x", "y"),
      Seq(Agg("cnt", count(lit(1)), Nil)))
    assert(rows(res, "x", "y", "cnt") == Set(Seq(1L, 3L, 2L), Seq(3L, 2L, 1L)))
    assert(logMsgs(log) == Seq(ErrorOps.GroupSkip, ErrorOps.GroupSkip))
  }

  private def skipErrorsFixture: DataFrame = {
    val t = Errors.init(Seq(
      (1L, 1L, 1.5, 1L, 1L), (1L, 2L, 2.5, 0L, 1L), (1L, 3L, 3.5, 1L, 0L),
      (2L, 4L, 4.5, 1L, 1L), (2L, 5L, 5.5, 1L, 0L)).toDF("a", "b", "c", "d", "e"))
    ErrorOps.trueDivChecked(
      ErrorOps.floorDivChecked(t, "b", col("b"), col("d")),
      "c", col("c"), col("e"))
  }

  test("test_groupby_skip_errors (_skip_errors=True, the default): errored inputs skipped") {
    val WithLog(res, log) = ErrorOps.reduceChecked(skipErrorsFixture, Seq("a"), Seq(
      Agg("i_sum", sum("b"), Seq("b")), Agg("i_avg", avg("b"), Seq("b")),
      Agg("i_min", min("b"), Seq("b")), Agg("f_sum", sum("c"), Seq("c")),
      Agg("f_avg", avg("c"), Seq("c")), Agg("f_min", min("c"), Seq("c")),
      Agg("cnt", count(lit(1)), Nil),
      Agg("st_sum", ErrorOps.foldLongChecked(col("b")) {
        (st, v) => st.getOrElse(0L) + v
      }, Seq("b"), fold = true)), skipErrors = true)
    assert(rows(res, "a", "i_sum", "i_avg", "i_min", "f_sum", "f_avg", "f_min", "cnt", "st_sum")
      == Set(
        Seq(1L, 4L, 2.0, 1L, 4.0, 2.0, 1.5, 3L, 4L),
        Seq(2L, 9L, 4.5, 4L, 4.5, 4.5, 4.5, 2L, 9L)))
    assert(log.count() == 0)
  }

  test("test_groupby_propagate_errors (_skip_errors=False): one errored input poisons the reducer") {
    val WithLog(res, _) = ErrorOps.reduceChecked(skipErrorsFixture, Seq("a"), Seq(
      Agg("i_sum", sum("b"), Seq("b")), Agg("i_avg", avg("b"), Seq("b")),
      Agg("i_min", min("b"), Seq("b")), Agg("f_sum", sum("c"), Seq("c")),
      Agg("f_avg", avg("c"), Seq("c")), Agg("f_min", min("c"), Seq("c")),
      Agg("cnt", count(lit(1)), Nil),
      Agg("st_sum", ErrorOps.foldLongChecked(col("b")) {
        (st, v) => st.getOrElse(0L) + v
      }, Seq("b"), fold = true)), skipErrors = false)
    val filled = Seq("i_sum", "i_avg", "i_min", "f_sum", "f_avg", "f_min", "st_sum")
      .foldLeft(res)((d, c) => Errors.fillError(d, c, lit(-1).cast(d.schema(c).dataType)))
    assert(rows(filled, "a", "i_sum", "i_avg", "i_min", "f_sum", "f_avg", "f_min", "cnt", "st_sum")
      == Set(
        Seq(1L, -1L, -1.0, -1L, -1.0, -1.0, -1.0, 3L, -1L),
        Seq(2L, 9L, 4.5, 4L, -1.0, -1.0, -1.0, 2L, 9L)))
  }

  test("test_groupby_stateful_with_error: a raising fold poisons the group and logs") {
    val t = Errors.init(Seq((1L, 1L), (2L, 2L), (1L, 3L), (2L, 4L), (1L, 5L))
      .toDF("a", "b"))
    val WithLog(res, log) = ErrorOps.reduceChecked(t, Seq("a"), Seq(
      Agg("b", ErrorOps.foldLongChecked(col("b")) { (st, v) =>
        if (v == 2L) throw new IllegalArgumentException("Value 2 encountered")
        st.getOrElse(0L) + v
      }, Seq("b"), fold = true)))
    val filled = Errors.fillError(res, "b", lit(-1L))
    assert(rows(filled, "a", "b") == Set(Seq(1L, 9L), Seq(2L, -1L)))
    assert(logMsgs(log) == Seq("IllegalArgumentException: Value 2 encountered"))
  }

  test("foldLongChecked skips errored (null) inputs — product fold pin (review)") {
    // a PRODUCT fold exposes null-as-zero: the errored cell must be
    // SKIPPED (result 3*5=15), not folded as 0
    val t = ErrorOps.floorDivChecked(
      Errors.init(Seq((1L, 3L, 1L), (1L, 4L, 0L), (1L, 5L, 1L)).toDF("g", "b", "d")),
      "b", col("b"), col("d"))
    val WithLog(res, _) = ErrorOps.reduceChecked(t, Seq("g"), Seq(
      Agg("p", ErrorOps.foldLongChecked(col("b")) {
        (st, v) => st.getOrElse(1L) * v
      }, Seq("b"), fold = true)), skipErrors = true)
    assert(rows(res, "g", "p") == Set(Seq(1L, 15L)))
  }

  test("joinChecked requires disjoint column names (review pin)") {
    val l = Errors.init(Seq((1L, "a")).toDF("k", "v"))
    val r = Seq((1L, "b")).toDF("k", "w")
    val e = intercept[IllegalArgumentException] {
      ErrorOps.joinChecked(l, r, Seq("k" -> "k"), "left")
    }
    assert(e.getMessage.contains("disjoint column names"))
  }

  test("test_unique_reducer: >1 distinct value = Error, recoverable") {
    val t = Errors.init(Seq(1L, 1L, 2L).toDF("a"))
    val WithLog(res, _) = ErrorOps.reduceChecked(t, Nil, Seq(
      Agg("a", min("a"), Seq("a"), poison = Some(ErrorOps.uniquePoison(col("a"))))))
    assert(rows(Errors.fillError(res, "a", lit(-1L)), "a") == Set(Seq(-1L)))
    val t2 = Errors.init(Seq(1L, 1L).toDF("a"))
    val WithLog(res2, _) = ErrorOps.reduceChecked(t2, Nil, Seq(
      Agg("a", min("a"), Seq("a"), poison = Some(ErrorOps.uniquePoison(col("a"))))))
    assert(rows(res2, "a") == Set(Seq(1L)))
  }

  test("test_deduplicate_with_error_in_instance: errored instance skips the row + logs") {
    val t1 = Errors.init(Seq((2L, 1L, 2L), (2L, 2L, 4L), (5L, 0L, 6L), (3L, 2L, 8L),
      (1L, 1L, 10L)).toDF("a", "b", "t"))
    val t2 = ErrorOps.trueDivChecked(t1, "inst", lit(2L), col("b"))
    val WithLog(res, log) = ErrorOps.dedupAcceptorChecked(t2, "a", "inst", "t")(_ > _)
    assert(rows(res, "a", "b") == Set(Seq(3L, 2L), Seq(2L, 1L)))
    assert(logMsgs(log) == Seq(ErrorOps.DedupInstanceSkip))
  }

  test("test_deduplicate_with_error_in_value: errored value skips the row") {
    val t1 = ErrorOps.floorDivChecked(
      Errors.init(Seq((2L, 1L, 2L), (4L, 0L, 4L), (3L, 1L, 6L)).toDF("a", "b", "t")),
      "a", col("a"), col("b"))
    val withInst = t1.withColumn("inst", lit(0L))
    val WithLog(res, _) = ErrorOps.dedupAcceptorChecked(withInst, "a", "inst", "t")(_ > _)
    assert(rows(res, "a") == Set(Seq(3L)))
  }

  test("test_deduplicate_with_error_in_acceptor: a raising acceptor rejects + logs") {
    val t1 = Errors.init(Seq((2L, 2L), (4L, 4L), (3L, 6L)).toDF("a", "t"))
      .withColumn("inst", lit(0L))
    val WithLog(res, log) = ErrorOps.dedupAcceptorChecked(t1, "a", "inst", "t") {
      (nv, ov) =>
        if (nv == 4L) throw new IllegalArgumentException("encountered 4")
        nv > ov
    }
    assert(rows(res, "a") == Set(Seq(3L)))
    assert(logMsgs(log) == Seq("IllegalArgumentException: encountered 4"))
  }

  test("test_with_id_from: errored key skips; duplicate keys poison the whole row") {
    // errored key expression → row skipped + reindex log (py:1233)
    val t = ErrorOps.trueDivChecked(
      Errors.init(Seq((1L, 0L), (2L, 1L)).toDF("a", "b")),
      "k", col("a"), col("b"))
    val WithLog(res, log) = ErrorOps.withIdFromChecked(t, col("k"), Seq("k"), Seq("a", "b"))
    assert(rows(res, "a", "b") == Set(Seq(2L, 1L)))
    assert(logMsgs(log) == Seq(ErrorOps.ReindexSkip))

    // duplicate reindex key (py:744) → ONE row, all value columns Error
    val d = Errors.init(Seq((1L, 3L), (2L, 4L), (3L, 5L), (3L, 6L)).toDF("a", "b"))
    val WithLog(res2, log2) = ErrorOps.withIdFromChecked(d, col("a"), Nil, Seq("a", "b"))
    val filled = Errors.fillError(Errors.fillError(res2, "a", lit(-1L)), "b", lit(-1L))
    assert(rows(filled, "a", "b") == Set(Seq(1L, 3L), Seq(2L, 4L), Seq(-1L, -1L)))
    assert(logMsgs(log2) == Seq("duplicate key: 3"))
  }

  test("test_concat (broken disjointness promise): overlapping key poisons one kept row") {
    val t1 = Errors.init(Seq((1L, 1L, 2L), (2L, 2L, 5L), (3L, 3L, 1L)).toDF("id", "a", "b"))
    val t2 = Errors.init(Seq((1L, 1L, 3L), (4L, 4L, 3L), (5L, 5L, 1L)).toDF("id", "a", "b"))
    val WithLog(res, log) = ErrorOps.concatChecked(t1, t2, "id", Seq("a", "b"))
    val filled = Errors.fillError(Errors.fillError(res, "a", lit(-1L)), "b", lit(-1L))
    assert(rows(filled, "a", "b") == Set(
      Seq(-1L, -1L), Seq(2L, 5L), Seq(3L, 1L), Seq(4L, 3L), Seq(5L, 1L)))
    assert(logMsgs(log) == Seq("duplicate key: 1"))
  }

  test("test_update_cells: missing key logs + drops; duplicate update poisons the row") {
    val old = Errors.init(Seq((1L, 1L, "Alice", 10L), (2L, 2L, "Alice", 10L))
      .toDF("id", "pet", "owner", "age"))
    val update = Seq((5L, 0L, "Eve", 10L), (2L, 2L, "Eve", 10L), (2L, 3L, "Eve", 10L))
      .toDF("id", "pet", "owner", "age")
    val WithLog(res, log) = ErrorOps.updateCellsChecked(old, update, "id",
      Seq("pet", "owner", "age"))
    val clean = Errors.removeErrors(res.select("id", "pet", "owner", "age", ErrCol))
    assert(rows(clean, "pet", "owner", "age") == Set(Seq(1L, "Alice", 10L)))
    assert(logMsgs(log) == Seq(
      "duplicate key: 2", "updating a row that does not exist, key: 5"))
  }

  test("test_update_rows via duplicate-reindex poisoning") {
    // t2 = markdown(1,1,2).with_id_from(a): key 1 duplicates → Error row
    val t2raw = Errors.init(Seq(1L, 1L, 2L).toDF("a"))
    val WithLog(t2, log) = ErrorOps.withIdFromChecked(t2raw, col("a"), Nil, Seq("a"))
    assert(logMsgs(log) == Seq("duplicate key: 1"))
    // update_rows(t1{1,2,3}, t2): the poisoned row overwrites key 1;
    // remove_errors leaves {2, 3}
    val t1 = Errors.init(Seq(1L, 2L, 3L).toDF("a"))
      .withColumn("_pw_new_id", col("a"))
    val merged = t1.join(t2.select(col("_pw_new_id").as("_k"), col("a").as("_ua"),
        col(ErrCol).as("_ue")), col("_pw_new_id") === col("_k"), "left_outer")
      .withColumn("a", when(col("_k").isNotNull, col("_ua")).otherwise(col("a")))
      .withColumn(ErrCol, when(col("_k").isNotNull, col("_ue")).otherwise(col(ErrCol)))
      .drop("_k", "_ua", "_ue")
    assert(rows(Errors.removeErrors(merged.select("a", ErrCol)), "a")
      == Set(Seq(2L), Seq(3L)))
  }

  test("test_restrict: broken subset promise materializes Error rows + logs") {
    val t1 = Errors.init(Seq((1L, 6L, 2L), (2L, 5L, 5L), (3L, 4L, 1L), (4L, 3L, 3L))
      .toDF("id", "a", "b"))
    val t2 = Seq((1L, 1L), (2L, 2L), (3L, 3L), (5L, 4L)).toDF("id", "c")
    val WithLog(res, log) = ErrorOps.restrictChecked(t1, t2, "id", Seq("a", "b"))
    val withC = res.join(t2, Seq("id"))
    val filled = Errors.fillError(Errors.fillError(withC, "a", lit(-1L)), "b", lit(-1L))
    assert(rows(filled, "a", "b", "c") == Set(
      Seq(6L, 2L, 1L), Seq(5L, 5L, 2L), Seq(4L, 1L, 3L), Seq(-1L, -1L, 4L)))
    assert(logMsgs(log) == Seq("key missing in output table: 5"))
  }

  test("test_with_universe_of: both-direction missing-key logs") {
    val t1 = Errors.init(Seq((1L, 6L, 2L), (2L, 5L, 5L), (3L, 4L, 1L), (4L, 3L, 3L))
      .toDF("id", "a", "b"))
    val t2 = Seq((1L, 1L), (2L, 2L), (3L, 3L), (5L, 5L)).toDF("id", "c")
    val WithLog(res, log) = ErrorOps.withUniverseOfChecked(t1, t2, "id", Seq("a", "b"))
    val filled = Errors.fillError(Errors.fillError(res.join(t2, Seq("id")), "a", lit(-1L)),
      "b", lit(-1L))
    assert(rows(filled, "a", "b", "c") == Set(
      Seq(6L, 2L, 1L), Seq(5L, 5L, 2L), Seq(4L, 1L, 3L), Seq(-1L, -1L, 5L)))
    assert(logMsgs(log) == Seq(
      "key missing in input table: 5",
      "key missing in output table: 4", "key missing in output table: 5"))
  }

  test("test_ix: dangling pointer poisons the fetched column + logs") {
    val t1 = Errors.init(Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 2L)).toDF("rid", "a"))
      .withColumn("ap", col("a"))
    val t2 = Seq((1L, 10L), (2L, 13L)).toDF("oid", "c")
    val WithLog(res, log) = ErrorOps.ixChecked(t1, t2, col("ap"), "oid", Seq("c"))
    val filled = Errors.fillError(res, "c", lit(-1L))
    assert(rows(filled, "a", "c") == Set(
      Seq(1L, 10L), Seq(3L, -1L), Seq(2L, 13L)))
    assert(filled.count() == 4)
    assert(logMsgs(log) == Seq("key missing in output table: 3"))
  }
}
