package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.functions.{Errors, Reducers}
import graft.functions.Exprs._

/** Error-value PROPAGATION semantics, decoded from tests/test_errors.py
  * (r16): how the reference's poisoned `Error` sentinel flows through
  * filter, join, groupby, deduplicate, reindex, update_cells and the
  * universe ops when the pipeline runs with `terminate_on_error=False`
  * (the DEFAULT mode terminates — that is the throwing kernels' job,
  * e.g. [[graft.functions.PyArithOp]]).
  *
  * Decoded rules (each replayed bit-exactly in ErrorFixtureSpec):
  *  - filter: an Error in the CONDITION skips the row and logs
  *    "Error value encountered in filter condition, skipping the row";
  *    an Error in any other column rides along (test_errors.py:112/149);
  *  - join: an Error in a join-key column never matches — the row is
  *    dropped from an inner join but KEPT UNMATCHED by an outer mode, and
  *    either way logs the join-condition message (py:189/232). Clean None
  *    keys match each other (value equality, not SQL three-valued);
  *  - groupby: an Error in a grouping column skips the row (+log, py:777);
  *    with `_skip_errors=True` (the reference default) errored inputs are
  *    silently skipped per-reducer; with False ONE errored input poisons
  *    that reducer's output for the group (py:858/915). `count` has no
  *    column dependency and never poisons. A raising stateful fold poisons
  *    its group and logs the exception (py:970);
  *  - unique reducer: >1 distinct value in a group = Error, recoverable
  *    when the group shrinks back (py:1129);
  *  - deduplicate: Error in instance/value skips the row (+log, py:818);
  *    a RAISING acceptor rejects the candidate and logs (py:1091);
  *  - reindex (with_id_from): an Error in the key expression skips the row
  *    ("…reindex as new id…", py:1233); DUPLICATE keys collapse to one row
  *    whose value columns are ALL Error + "duplicate key: <k>" (py:744),
  *    and the same rule drives broken-promise concat (py:459);
  *  - update_cells: an update for a missing key logs "updating a row that
  *    does not exist, key: <k>" and is dropped; duplicate updates for one
  *    key poison that row's updated cells + "duplicate key" (py:1153);
  *  - restrict / with_universe_of: a missing key materializes as a row of
  *    Error values + "key missing in output/input table: <k>" (py:545/590);
  *    ix with a dangling pointer poisons the fetched columns (py:637).
  *
  * Encoding: the [[graft.functions.Errors]] accumulator (`_pw_errors`
  * array; Error value = NULL + record). Every operator returns [[WithLog]]
  * — the output table plus its slice of the reference's global error log;
  * union the slices for the pw.global_error_log() view. Log keys print as
  * the key VALUE, not the reference's pointer hash (documented).
  *
  * Scale shapes: everything here is equi-join / hash-agg / one window over
  * the new key — no all-pairs, no driver collection; the dedup kernel is
  * per-instance sequential (inherently so, same as the reference) and
  * partitions by instance.
  */
object ErrorOps {
  import Errors.ErrCol

  /** Output table (carrying `_pw_errors`) + this operator's error-log rows
    * (single `message` column). */
  final case class WithLog(table: DataFrame, log: DataFrame)

  // reference messages, verbatim (tests/test_errors.py expected_errors)
  val DivisionByZero = "division by zero"
  val FilterSkip = "Error value encountered in filter condition, skipping the row"
  val JoinSkip = "Error value encountered in join condition, skipping the row"
  val GroupSkip = "Error value encountered in grouping columns, skipping the row"
  val DedupInstanceSkip = "Error value encountered in deduplicate instance, skipping the row"
  val DedupValueSkip = "Error value encountered in deduplicate value, skipping the row"
  val ReindexSkip = "Error value encountered in reindex as new id, skipping the row"

  private def hasErr(name: String): Column =
    exists(col(ErrCol), e => e("col") === name)
  private def anyErr(names: Seq[String]): Column =
    names.map(hasErr).reduceOption(_ || _).getOrElse(lit(false))
  private def errRec(name: String, msg: String): Column =
    struct(lit(name).as("col"), lit(msg).as("msg"))
  private def msgRows(df: DataFrame, msg: Column): DataFrame =
    df.select(msg.cast("string").as("message"))

  /** The log slice a checked column op (floorDivChecked & co.) contributes:
    * one DivisionByZero row per errored cell. */
  def logOf(df: DataFrame, name: String, msg: String = DivisionByZero): DataFrame =
    msgRows(df.filter(hasErr(name)), lit(msg))

  // ── checked arithmetic (the fixtures' error source) ────────────────────

  /** `a // b` in non-terminate mode: floor-div value, zero/null divisor →
    * Error record instead of the terminate-mode throw. */
  def floorDivChecked(df: DataFrame, name: String, num: Column, den: Column): DataFrame =
    Errors.withTry(df, name, num.floorDiv(den), den.isNull || den === 0, DivisionByZero)

  /** `a / b` (always-float) in non-terminate mode. */
  def trueDivChecked(df: DataFrame, name: String, num: Column, den: Column): DataFrame =
    Errors.withTry(df, name, num.pyDiv(den), den.isNull || den === 0, DivisionByZero)

  // ── filter ──────────────────────────────────────────────────────────────

  /** `deps` = the columns the condition reads; a row with an Error in any
    * of them is skipped + logged, everything else filters normally. */
  def filterChecked(df: DataFrame, cond: Column, deps: Seq[String]): WithLog = {
    val bad = anyErr(deps)
    WithLog(
      df.filter(!bad && coalesce(cond, lit(false))),
      msgRows(df.filter(bad), lit(FilterSkip)))
  }

  // ── join ─────────────────────────────────────────────────────────────────

  /** Equi-join with reference error semantics. `on` pairs (leftCol,
    * rightCol); clean keys match with VALUE equality (None==None). Modes:
    * "inner" | "left". */
  def joinChecked(left: DataFrame, right: DataFrame, on: Seq[(String, String)],
      how: String = "inner"): WithLog = {
    Predef.require(how == "inner" || how == "left",
      s"joinChecked supports inner/left, got: $how")
    Predef.require(
      (left.columns.toSet - ErrCol).intersect(right.columns.toSet - ErrCol).isEmpty,
      "joinChecked requires disjoint column names (rename before joining) — " +
        "a shared name would collide in the unmatched-row padding")
    val r0 = (if (right.columns.contains(ErrCol)) right else Errors.init(right))
      .withColumnRenamed(ErrCol, "_pw_errors_r")
    def rHasErr(name: String): Column =
      exists(r0("_pw_errors_r"), e => e("col") === name)
    val lBadC = anyErr(on.map(_._1))
    val rBadC = on.map(p => rHasErr(p._2)).reduceOption(_ || _).getOrElse(lit(false))

    val lClean = left.filter(!lBadC)
    val lBad = left.filter(lBadC)
    val rClean = r0.filter(!rBadC)
    val rBad = r0.filter(rBadC)

    val cond = on.map { case (lk, rk) => lClean(lk) <=> rClean(rk) }.reduce(_ && _)
    val joined = lClean.join(rClean, cond, if (how == "left") "left_outer" else "inner")
      .withColumn(ErrCol,
        concat(col(ErrCol), coalesce(col("_pw_errors_r"), Errors.emptyErrors)))
      .drop("_pw_errors_r")

    val out =
      if (how == "inner") joined
      else {
        // an error-keyed left row is kept as an UNMATCHED row (py:232)
        val rightFields = r0.schema.fields.filterNot(_.name == "_pw_errors_r")
        val padded = rightFields.foldLeft(lBad)((d, f) =>
          d.withColumn(f.name, lit(null).cast(f.dataType)))
        joined.unionByName(padded.select(joined.columns.map(col): _*))
      }
    val log = msgRows(lBad, lit(JoinSkip)).unionByName(msgRows(rBad, lit(JoinSkip)))
    WithLog(out, log)
  }

  // ── groupby / reduce ─────────────────────────────────────────────────────

  /** One reducer column: `agg` aggregates `deps` input columns; `poison`
    * (an aggregate boolean) marks self-inflicted errors (unique reducer);
    * `fold = true` marks `agg` as a checked fold returning a
    * (value, errMsg) tuple struct — fields `_1`/`_2` under Spark's tuple
    * encoder (see [[foldLongChecked]]). */
  final case class Agg(name: String, agg: Column, deps: Seq[String],
      poison: Option[Column] = None, fold: Boolean = false)

  /** `unique` reducer (reducers.py:520): the single distinct value, or
    * Error when the group holds more than one — express as Agg(name,
    * min(c), deps, poison = Some(uniquePoison(c))). */
  def uniquePoison(c: Column): Column = count_distinct(c) > 1

  /** A stateful fold whose function may THROW: the exception poisons the
    * group's output and its message lands in the log (py:970). The merge
    * folds the right partial's value into the left state — the semigroup
    * contract the reference's combine step has too. */
  def foldLongChecked(c: Column)(foldFn: (Option[Long], Long) => Long): Column = {
    val agg = Reducers.statefulSingle[java.lang.Long, (Boolean, Long, String), (java.lang.Long, String)](
      (false, 0L, null)) { case ((has, s, m), v) =>
        // an errored input is NULL under the accumulator encoding — skip it
        // (the _skip_errors=True route; the False route poisons via the
        // dep flag in reduceChecked, not here)
        if (m != null || v == null) (has, s, m)
        else try { (true, foldFn(if (has) Some(s) else None, v), null) }
        catch { case e: Exception => (has, s, s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      } { case ((h1, s1, m1), (h2, s2, m2)) =>
        if (m1 != null) (h1, s1, m1)
        else if (m2 != null) (h2, s2, m2)
        else if (!h2) (h1, s1, m1)
        else if (!h1) (h2, s2, m2)
        else try { (true, foldFn(Some(s1), s2), null) }
        catch { case e: Exception => (h1, s1, s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      } { case (has, s, m) =>
        if (m != null) (null, m) else if (has) (Long.box(s), null) else (null, null)
      }(Encoders.product, Encoders.product)
    udaf(agg).apply(c)
  }

  /** groupby + reduce with the decoded error rules. */
  def reduceChecked(df: DataFrame, keys: Seq[String], aggs: Seq[Agg],
      skipErrors: Boolean = true): WithLog = {
    val badKeys = if (keys.isEmpty) df.limit(0) else df.filter(anyErr(keys))
    val clean = if (keys.isEmpty) df else df.filter(!anyErr(keys))

    val depFlags =
      if (skipErrors) Nil
      else aggs.flatMap(_.deps).distinct.map(d =>
        max(when(hasErr(d), lit(true)).otherwise(lit(false))).as(s"_err_$d"))
    val poisonAggs = aggs.flatMap(a => a.poison.map(_.as(s"_poison_${a.name}")))
    val aggExprs = aggs.map(a => a.agg.as(a.name)) ++ depFlags ++ poisonAggs

    val grouped = clean.groupBy(keys.map(col): _*).agg(aggExprs.head, aggExprs.tail: _*)

    def flagOf(a: Agg): Option[Column] = {
      val dep =
        if (skipErrors) None
        else a.deps.map(d => col(s"_err_$d")).reduceOption(_ || _)
      val self = a.poison.map(_ => col(s"_poison_${a.name}"))
      val foldErr = if (a.fold) Some(col(s"_fold_msg_${a.name}").isNotNull) else None
      (dep.toSeq ++ self.toSeq ++ foldErr.toSeq).reduceOption(_ || _)
    }

    // fold logs come from the aggregated struct BEFORE the value is unwrapped
    val foldLogs = aggs.filter(_.fold).map(a =>
      msgRows(grouped.filter(col(a.name)("_2").isNotNull), col(a.name)("_2")))

    val withMsg = aggs.filter(_.fold).foldLeft(grouped)((d, a) =>
      d.withColumn(s"_fold_msg_${a.name}", col(a.name)("_2")))
    val unwrapped = aggs.filter(_.fold).foldLeft(withMsg)((d, a) =>
      d.withColumn(a.name, col(a.name)("_1")))
    val out0 = aggs.foldLeft(unwrapped)((d, a) => flagOf(a) match {
      case Some(f) => d.withColumn(a.name, when(f, lit(null)).otherwise(col(a.name)))
      case None => d
    })
    val recs = aggs.flatMap(a => flagOf(a).map(f =>
      when(f, array(errRec(a.name, "error value in aggregation input")))
        .otherwise(Errors.emptyErrors)))
    val out = out0
      .withColumn(ErrCol,
        recs.reduceOption((x, y) => concat(x, y)).getOrElse(Errors.emptyErrors))
      .drop(aggs.flatMap(_.deps).distinct.map(d => s"_err_$d"): _*)
      .drop(aggs.flatMap(a => a.poison.map(_ => s"_poison_${a.name}")): _*)
      .drop(aggs.filter(_.fold).map(a => s"_fold_msg_${a.name}"): _*)

    val log = (msgRows(badKeys, lit(GroupSkip)) +: foldLogs)
      .reduce(_ unionByName _)
    WithLog(out, log)
  }

  // ── deduplicate ──────────────────────────────────────────────────────────

  /** Batch replay of the checked deduplicate kernel: per instance, rows
    * fold in time order; Error in instance/value skips the row (+log);
    * a throwing acceptor REJECTS the candidate and logs the exception.
    * Sequential per instance by nature (the reference's kernel is too);
    * partitions by instance. */
  def dedupAcceptorChecked(df: DataFrame, valueCol: String, instanceCol: String,
      timeCol: String)(acceptor: (Long, Long) => Boolean): WithLog = {
    val instBad = df.filter(hasErr(instanceCol))
    val valBad = df.filter(!hasErr(instanceCol) && hasErr(valueCol))
    val clean = df.filter(!hasErr(instanceCol) && !hasErr(valueCol))

    val outSchema = StructType(clean.schema.fields :+ StructField("_log", StringType))
    val vIdx = clean.schema.fieldIndex(valueCol)
    val tIdx = clean.schema.fieldIndex(timeCol)
    val iIdx = clean.schema.fieldIndex(instanceCol)
    val width = clean.schema.size

    val kernelled = clean
      .groupByKey(r => String.valueOf(r.get(iIdx)))(Encoders.STRING)
      .flatMapGroups { (_, it) =>
        val rows = it.toVector.sortBy(_.getLong(tIdx))
        var state: Option[Row] = None
        val logs = Vector.newBuilder[Row]
        rows.foreach { r =>
          val v = r.getLong(vIdx)
          state match {
            case None => state = Some(r)
            case Some(prev) =>
              val ok =
                try acceptor(v, prev.getLong(vIdx))
                catch {
                  case e: Exception =>
                    logs += Row.fromSeq(Seq.fill(width)(null) :+
                      s"${e.getClass.getSimpleName}: ${e.getMessage}")
                    false
                }
              if (ok) state = Some(r)
          }
        }
        (state.map(r => Row.fromSeq(r.toSeq :+ null)).toVector ++ logs.result()).iterator
      }(Encoders.row(outSchema))

    val out = kernelled.filter(col("_log").isNull).drop("_log")
    val log = msgRows(kernelled.filter(col("_log").isNotNull), col("_log"))
      .unionByName(msgRows(instBad, lit(DedupInstanceSkip)))
      .unionByName(msgRows(valBad, lit(DedupValueSkip)))
    WithLog(out, log)
  }

  // ── reindex / broken-promise concat ──────────────────────────────────────

  /** with_id_from with the decoded error rules: an Error in the key deps
    * skips the row; duplicate keys collapse to ONE row whose value columns
    * are ALL Error (+ "duplicate key: <k>" log). `valueCols` = every
    * non-key payload column. */
  def withIdFromChecked(df: DataFrame, key: Column, keyDeps: Seq[String],
      valueCols: Seq[String]): WithLog = {
    val bad = df.filter(anyErr(keyDeps))
    val clean = df.filter(!anyErr(keyDeps)).withColumn("_pw_new_id", key)
    val w = Window.partitionBy(col("_pw_new_id"))
    val flagged = clean
      .withColumn("_pw_dup", count(lit(1)).over(w) > 1)
      .withColumn("_pw_rn",
        row_number().over(w.orderBy(valueCols.map(col): _*)))
      .filter(col("_pw_rn") === 1)
    val poisoned = valueCols.foldLeft(flagged)((d, c) =>
      d.withColumn(c, when(col("_pw_dup"), lit(null)).otherwise(col(c))))
      .withColumn(ErrCol, when(col("_pw_dup"),
          concat(col(ErrCol),
            array(valueCols.map(c => errRec(c, "duplicate key")): _*)))
        .otherwise(col(ErrCol)))
    val dupLog = msgRows(flagged.filter(col("_pw_dup")),
      concat_ws(" ", lit("duplicate key:"), col("_pw_new_id").cast("string")))
    WithLog(poisoned.drop("_pw_dup", "_pw_rn"), msgRows(bad, lit(ReindexSkip)).unionByName(dupLog))
  }

  /** Broken-promise concat (py:459): union two tables whose keys were
    * PROMISED disjoint; a key landing on both sides keeps one row with all
    * value columns Error. Same collapse rule as [[withIdFromChecked]]. */
  def concatChecked(t1: DataFrame, t2: DataFrame, idCol: String,
      valueCols: Seq[String]): WithLog =
    withIdFromChecked(t1.unionByName(t2), col(idCol), Nil, valueCols)

  // ── update_cells / update_rows ───────────────────────────────────────────

  /** update_cells with the decoded error rules (py:1153). */
  def updateCellsChecked(old: DataFrame, update: DataFrame, idCol: String,
      overlap: Seq[String]): WithLog = {
    val cnts = update.groupBy(col(idCol).as("_pw_upd_id"))
      .agg(count(lit(1)).as("_pw_cnt"),
        overlap.map(c => first(col(c)).as(s"_pw_new_$c")): _*)
    val joined = old.join(cnts, old(idCol) === cnts("_pw_upd_id"), "left_outer")
    val dup = col("_pw_cnt") > 1
    val one = col("_pw_cnt") === 1
    val replaced = overlap.foldLeft(joined)((d, c) =>
      d.withColumn(c,
        when(dup, lit(null)).when(one, col(s"_pw_new_$c")).otherwise(col(c))))
    val out = replaced
      .withColumn(ErrCol, when(dup,
          concat(col(ErrCol), array(overlap.map(c => errRec(c, "duplicate key")): _*)))
        .otherwise(col(ErrCol)))
      .drop("_pw_upd_id", "_pw_cnt")
      .drop(overlap.map(c => s"_pw_new_$c"): _*)
    val dupLog = msgRows(cnts.filter(col("_pw_cnt") > 1),
      concat_ws(" ", lit("duplicate key:"), col("_pw_upd_id").cast("string")))
    val missingLog = msgRows(
      cnts.join(old.select(col(idCol)), cnts("_pw_upd_id") === old(idCol), "left_anti"),
      concat_ws(" ", lit("updating a row that does not exist, key:"),
        col("_pw_upd_id").cast("string")))
    WithLog(out, dupLog.unionByName(missingLog))
  }

  // ── universe ops: restrict / with_universe_of / ix ───────────────────────

  /** restrict(t2) with a broken subset promise (py:545): t2 keys missing
    * from t1 materialize as rows whose t1-value columns are Error. */
  def restrictChecked(t1: DataFrame, t2Keys: DataFrame, idCol: String,
      valueCols: Seq[String]): WithLog = {
    val joined = t2Keys.select(col(idCol))
      .join(t1.withColumnRenamed(idCol, "_pw_t1_id"),
        col(idCol) === col("_pw_t1_id"), "left_outer")
    val missing = col("_pw_t1_id").isNull
    val out = valueCols.foldLeft(joined)((d, c) =>
      d.withColumn(c, when(missing, lit(null)).otherwise(col(c))))
      .withColumn(ErrCol, when(missing,
          array(valueCols.map(c => errRec(c, "key missing in output table")): _*))
        .otherwise(col(ErrCol)))
      .drop("_pw_t1_id")
    val log = msgRows(joined.filter(missing),
      concat_ws(" ", lit("key missing in output table:"), col(idCol).cast("string")))
    WithLog(out, log)
  }

  /** with_universe_of (py:590): re-key t1 onto t2's key set; keys missing
    * on either side log (missing-from-t1 keys log BOTH directions, like
    * the reference's double entry) and materialize as Error rows where t1
    * has no values. */
  def withUniverseOfChecked(t1: DataFrame, t2Keys: DataFrame, idCol: String,
      valueCols: Seq[String]): WithLog = {
    val base = restrictChecked(t1, t2Keys, idCol, valueCols)
    val missingFromT2 = msgRows(
      t1.select(col(idCol))
        .join(t2Keys.select(col(idCol).as("_pw_t2_id")),
          col(idCol) === col("_pw_t2_id"), "left_anti"),
      concat_ws(" ", lit("key missing in output table:"), col(idCol).cast("string")))
    val missingFromT1 = msgRows(
      t2Keys.select(col(idCol))
        .join(t1.select(col(idCol).as("_pw_t1_id")),
          col(idCol) === col("_pw_t1_id"), "left_anti"),
      concat_ws(" ", lit("key missing in input table:"), col(idCol).cast("string")))
    WithLog(base.table, base.log.unionByName(missingFromT1).unionByName(missingFromT2))
  }

  /** ix via pointer with a dangling target (py:637): the fetched columns
    * become Error on that row (non-terminate mode; the strict/terminate
    * path is PwTable.ix's raise). */
  def ixChecked(t1: DataFrame, other: DataFrame, ptr: Column, otherId: String,
      fetch: Seq[String]): WithLog = {
    val r = other.select((otherId +: fetch).map(col): _*)
      .withColumnRenamed(otherId, "_pw_ix_id")
    val joined = t1.join(r, ptr === col("_pw_ix_id"), "left_outer")
    val dangling = ptr.isNotNull && col("_pw_ix_id").isNull
    val out = joined
      .withColumn(ErrCol, when(dangling,
          concat(col(ErrCol),
            array(fetch.map(c => errRec(c, "key missing in output table")): _*)))
        .otherwise(col(ErrCol)))
      .drop("_pw_ix_id")
    val log = msgRows(joined.filter(dangling),
      concat_ws(" ", lit("key missing in output table:"), ptr.cast("string")))
    WithLog(out, log)
  }
}
