package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Errors

/** Error-value semantics (reference Error sentinel value.rs:228,
  * Table.remove_errors table.py:2753, pw.fill_error common.py:438):
  * bad rows poison their value and land in the error log instead of
  * failing the pipeline. */
class ErrorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def checked = {
    val df = Seq(
      (1L, 10.0, 2L, "7"),     // clean
      (2L, 10.0, 0L, "8"),     // division by zero
      (3L, 10.0, 5L, "x"),     // bad cast
      (4L, 10.0, 0L, "y")      // both
    ).toDF("id", "num", "den", "s")
    Errors.tryCast(
      Errors.tryDiv(Errors.init(df), "ratio", col("num"), col("den")),
      "s_num", col("s"), "bigint")
  }

  test("try* poison the value and record the error; clean rows untouched") {
    val rows = checked.select("id", "ratio", "s_num").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(rows(1L) == ((Some(5.0), Some(7L))))
    assert(rows(2L) == ((None, Some(8L))))
    assert(rows(3L) == ((Some(2.0), None)))
    assert(rows(4L) == ((None, None)))
  }

  test("removeErrors keeps only clean rows and drops the accumulator") {
    val clean = Errors.removeErrors(checked)
    assert(clean.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(!clean.columns.contains(Errors.ErrCol))
  }

  test("errorTable exposes one row per failed column") {
    val errs = Errors.errorTable(checked, col("id"))
      .select("id", "err_col").as[(Long, String)].collect().toSet
    assert(errs == Set((2L, "ratio"), (3L, "s_num"), (4L, "ratio"), (4L, "s_num")))
  }

  test("fillError replaces the poisoned value and clears its record") {
    val filled = Errors.fillError(checked, "ratio", lit(-1.0))
    val r = filled.select("id", "ratio").as[(Long, Double)].collect().toMap
    assert(r(2L) == -1.0 && r(4L) == -1.0 && r(1L) == 5.0)
    // rows 2 is clean again; row 4 still carries the cast error
    val clean = Errors.removeErrors(filled).select("id").as[Long].collect().toSet
    assert(clean == Set(1L, 2L))
  }
}
