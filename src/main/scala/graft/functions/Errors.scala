package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Error-value semantics (reference: poisoned `Error` sentinel propagated
  * through expressions instead of failing the pipeline —
  * src/engine/value.rs:228; `Table.remove_errors`
  * python/pathway/internals/table.py:2753; `pw.fill_error`
  * internals/common.py:438; global error log internals/errors.py).
  *
  * Spark-first encoding: a checked table carries a per-row accumulator column
  * `_pw_errors: array<struct<col, msg>>`. `try*` operators write NULL into the
  * value column and append an error record instead of throwing — so one bad
  * row out of 10^11 lands in the error side-table instead of killing the job.
  * Every builder stays on codegen'd built-ins; the only HOFs
  * (exists/filter/explode) run on ≤ n-column arrays.
  *
  *   - init          — attach the empty accumulator
  *   - withTry       — generic guarded column (value, failed-predicate, msg)
  *   - tryCast       — non-ANSI cast, error iff input non-null and cast null
  *   - tryDiv        — error on zero/null denominator
  *   - tryRequire    — pw.unwrap/require: error on null
  *   - fillError     — pw.fill_error: replace a column's error with a default
  *                     (and clear its record)
  *   - removeErrors  — Table.remove_errors: keep clean rows, drop accumulator
  *   - errorTable    — the error log: one row per (row, failed column)
  */
object Errors {

  val ErrCol = "_pw_errors"

  private[graft] def emptyErrors: Column =
    expr("CAST(array() AS ARRAY<STRUCT<col: STRING, msg: STRING>>)")

  /** Attach the (empty) error accumulator to a table. */
  def init(df: DataFrame): DataFrame = df.withColumn(ErrCol, emptyErrors)

  /** Guarded column: `name` = NULL + error record when `failed`, else `value`.
    * The building block every try* variant lowers to. */
  def withTry(df: DataFrame, name: String, value: Column, failed: Column,
      msg: String): DataFrame =
    df.withColumn(name, when(failed, lit(null)).otherwise(value))
      .withColumn(ErrCol, when(failed,
          array_append(col(ErrCol), struct(lit(name).as("col"), lit(msg).as("msg"))))
        .otherwise(col(ErrCol)))

  /** Checked cast (non-ANSI cast yields NULL on failure; that NULL on a
    * non-null input is the error signal — same lowering as Spark's try_cast). */
  def tryCast(df: DataFrame, name: String, c: Column, toType: String): DataFrame =
    withTry(df, name, c.cast(toType), c.isNotNull && c.cast(toType).isNull,
      s"invalid cast to $toType")

  /** Checked division (Spark's non-ANSI Divide already yields NULL on zero —
    * here the zero denominator additionally lands in the error log). */
  def tryDiv(df: DataFrame, name: String, num: Column, den: Column): DataFrame =
    withTry(df, name, num / den, den.isNull || den === 0, "division by zero")

  /** pw.unwrap / pw.require: value must be non-null. */
  def tryRequire(df: DataFrame, name: String, c: Column): DataFrame =
    withTry(df, name, c, c.isNull, "unexpected null")

  /** pw.fill_error: replace `name`'s error with `default` and clear its
    * record — the row is clean again for that column. */
  def fillError(df: DataFrame, name: String, default: Column): DataFrame =
    df.withColumn(name,
        when(exists(col(ErrCol), e => e("col") === name), default).otherwise(col(name)))
      .withColumn(ErrCol, filter(col(ErrCol), e => e("col") =!= name))

  /** Table.remove_errors: rows with a clean accumulator, accumulator dropped. */
  def removeErrors(df: DataFrame): DataFrame =
    df.filter(size(col(ErrCol)) === 0).drop(ErrCol)

  /** The error side-table: (keys..., err_col, err_msg), one row per failed
    * column per row — the engine's global error log, but queryable. */
  def errorTable(df: DataFrame, keys: Column*): DataFrame =
    df.filter(size(col(ErrCol)) > 0)
      .select(keys :+ explode(col(ErrCol)).as("_e"): _*)
      .withColumn("err_col", col("_e.col"))
      .withColumn("err_msg", col("_e.msg"))
      .drop("_e")
}
