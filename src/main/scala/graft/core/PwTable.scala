package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DataType

/** A Pathway-style keyed table: a DataFrame plus a stable id column `_pw_id`.
  *
  * Mirrors the *semantics* of the reference `Table` (universe + typed columns,
  * python/pathway/internals/table.py:53) on idiomatic Spark: the universe is just a key
  * column, operators are declarative DataFrame transformations, and Catalyst supplies
  * the optimizations the reference lacks (pushdown, pruning, join selection, codegen).
  *
  * Id-derivation rules (reference semantics, re-expressed):
  *  - row-wise ops (select/filter/with_columns/...) preserve `_pw_id`
  *  - groupby/reduce: id = hash(grouping values)     (groupbys.py:71)
  *  - join: id = hash(left_id, right_id)             (joins.py:135, `id=` arg overrides)
  *  - flatten: id = hash(origin_id, position)        (table.py:2341)
  *  - concat keeps ids (disjointness checkable); concat_reindex re-hashes with a side tag
  */
final class PwTable private (val df: DataFrame) extends Serializable {
  import Keys.IdCol

  def id: Column = df(IdCol)
  def apply(name: String): Column = df(name)
  def columns: Seq[String] = df.columns.toSeq.filterNot(_ == IdCol)
  def spark: SparkSession = df.sparkSession

  /** Drop the bookkeeping id column — for sinks / oracle-facing results. */
  def toDf: DataFrame = df.drop(IdCol)

  private def wrap(d: DataFrame): PwTable = new PwTable(d)

  // ───────────────────────── row-wise (universe-preserving) ─────────────────────────

  /** Pathway `select` (table.py:389): rowwise projection, same universe.
    * Future-typed columns (fully-async UDF outputs) pass through bare but
    * are rejected inside any computation (test_udf.py:1131). */
  def select(cols: (String, Column)*): PwTable = {
    cols.foreach { case (_, c) => graft.functions.Futures.checkExpression(df, c) }
    wrap(df.select(col(IdCol) +: cols.map { case (n, c) => c.as(n) }: _*))
  }

  /** Pathway `with_columns` (table.py:1865): add/replace columns. */
  def withColumns(cols: (String, Column)*): PwTable = {
    cols.foreach { case (_, c) => graft.functions.Futures.checkExpression(df, c) }
    wrap(df.withColumns(cols.toMap))
  }

  /** A fully-async UDF column (udfs `fully_async_executor`,
    * test_udf.py:1069): the value lands with dtype Future[innerPy] — usable
    * only for pass-through (or another fully-async UDF) until
    * [[awaitFutures]]. Execution is synchronous (SEMANTICS D10); the dtype
    * GATE is the decoded engine contract. */
  def withFullyAsync(name: String, value: Column, innerPy: String): PwTable =
    wrap(df.withColumn(name, value)
      .withMetadata(name, graft.functions.Futures.metadataFor(innerPy)))

  /** Pathway `await_futures()` (test_udf.py:1348): resolve every
    * Future-typed column — afterwards expressions/reducers/groupby are
    * allowed again. Values are already materialized here, so this only
    * strips the dtype flag. */
  def awaitFutures(): PwTable =
    wrap(df.schema.fields.filter(graft.functions.Futures.isFuture)
      .foldLeft(df)((d, f) => d.withMetadata(f.name,
        // strip ONLY the future flag — coexisting metadata (pw.append_only,
        // pw.primary_key) must survive resolution
        new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .remove(graft.functions.Futures.Flag).build())))

  /** Pathway `filter` (table.py:497). A future column in the condition —
    * bare or computed — is a USE, not a pass-through (SEMANTICS 84). */
  def filter(cond: Column): PwTable = {
    graft.functions.Futures.checkExpression(df, cond, allowBare = false)
    wrap(df.filter(cond))
  }

  /** Pathway `split` (table.py:538): one logical pass → (matching, rest).
    * Catalyst shares the scan between the two branches. */
  def split(cond: Column): (PwTable, PwTable) =
    (filter(cond), filter(!coalesce(cond, lit(false))))

  /** Pathway `rename_columns`/`rename_by_dict` (table.py:2015). */
  def rename(pairs: (String, String)*): PwTable =
    wrap(df.withColumnsRenamed(pairs.toMap))

  def withPrefix(p: String): PwTable =
    wrap(df.withColumnsRenamed(columns.map(c => c -> s"$p$c").toMap))

  def withSuffix(s: String): PwTable =
    wrap(df.withColumnsRenamed(columns.map(c => c -> s"$c$s").toMap))

  /** Pathway `without` (table.py:2232). */
  def without(cols: String*): PwTable = wrap(df.drop(cols: _*))

  /** Pathway `cast_to_types` (table.py:2232). A future column cannot be
    * cast until await_futures() (SEMANTICS 84). */
  def castToTypes(types: (String, DataType)*): PwTable = {
    graft.functions.Futures.checkUsable(df, types.map { case (n, _) => df(n) })
    wrap(df.withColumns(types.map { case (n, t) => n -> df(n).cast(t) }.toMap))
  }

  // ───────────────────────────────── grouping ─────────────────────────────────

  /** Pathway `groupby` (table.py:1192). `instance` is just an extra grouping column
    * used for sharding (SURVEY §2.4) — pass it as one of the keys. */
  def groupby(keys: (String, Column)*): PwGrouped = {
    graft.functions.Futures.checkUsable(df, keys.map(_._2))
    PwGrouped(this, keys)
  }

  def groupbyCols(names: String*): PwGrouped = {
    graft.functions.Futures.checkUsable(df, names.map(df(_)))
    PwGrouped(this, names.map(n => n -> df(n)))
  }

  /** Pathway `deduplicate` (table.py:1315) — batch form: keep, per instance, the single
    * row maximal under `priority` (the acceptor reduced to an ordering). Implemented as
    * `max_by(struct(all), priority)` — one shuffle, map-side combine, no window sort. */
  def deduplicate(instance: Seq[Column], priority: Column): PwTable = {
    graft.functions.Futures.checkUsable(df, instance :+ priority)
    val payload = struct(df.columns.map(df(_)): _*)
    val out = df
      .groupBy(instance: _*)
      .agg(max_by(payload, priority).as("_row"))
      .select(col("_row.*"))
    wrap(out)
  }

  // ────────────────────────────────── joins ──────────────────────────────────

  /** Pathway equi-join (internals/joins.py:135): result id = hash(left_id, right_id).
    * `how`: inner | left | right | full. Catalyst picks broadcast/SMJ/shuffled-hash. */
  def join(other: PwTable, on: Column, how: String = "inner"): PwJoinResult = {
    val l = df.alias("l")
    val r = other.df.withColumnRenamed(IdCol, "_pw_id_r").alias("r")
    val joined = l.join(r, on, normalizeHow(how))
    // a future column in the join predicate is a USE (SEMANTICS 84); the
    // condition spans both frames, so the gate reads the analyzed Join node
    graft.functions.Futures.checkJoinCondition(joined)
    PwJoinResult(joined, spark)
  }

  /** Pathway `join` with NO `on` between DIFFERENT universes — a CROSS
    * join (test_common.py test_cross_join: every (left, right) pair, id =
    * hash(left_id, right_id)). Genuinely cartesian by the reference's
    * semantics — size the sides accordingly (same-universe lookups belong
    * on [[join]]/[[ix]]). */
  def crossJoin(other: PwTable): PwJoinResult = {
    val l = df.alias("l")
    val r = other.df.withColumnRenamed(IdCol, "_pw_id_r").alias("r")
    PwJoinResult(l.crossJoin(r), spark)
  }

  private def normalizeHow(how: String): String = how match {
    case "left"  => "left_outer"
    case "right" => "right_outer"
    case "full" | "outer" => "full_outer"
    case h => h
  }

  /** Pathway `ix` / `ix_ref` (table.py:1416, 2662): row lookup by pointer.
    * `optional=true` → left join (null/missing pointers → nulls,
    * test_ix_none); strict → a DANGLING pointer fails loudly, like the
    * reference's runtime KeyError (test_ix_missing_key) — an inner join
    * would silently shrink the universe instead (r15 decode). */
  def ix(other: PwTable, keyExpr: Column, optional: Boolean = false): PwTable = {
    val r = other.df.withColumnRenamed(IdCol, "_pw_ix_id")
    val joined = df.join(r, keyExpr === col("_pw_ix_id"), "left_outer")
    val checked =
      if (optional) joined
      else joined.where(when(col("_pw_ix_id").isNull,
        raise_error(concat_ws(" ", lit("ix: missing key"),
          coalesce(keyExpr.cast("string"), lit("null")))))
        .otherwise(lit(true)))
    wrap(checked.drop("_pw_ix_id"))
  }

  // ─────────────────────────────── set operations ───────────────────────────────

  /** Pathway `concat` (table.py:1586): union of disjoint key-spaces.
    * Disjointness is the caller's contract here — the reference checks it
    * at runtime for free from its universe bookkeeping, but a distributed
    * check costs a shuffle, so the fast path trusts the contract and
    * [[concatStrict]] carries the reference-faithful runtime error. */
  def concat(others: PwTable*): PwTable =
    wrap(others.foldLeft(df)((a, b) => a.unionByName(b.df)))

  /** Reference-faithful `concat`: intersecting key universes fail loudly
    * at runtime (test_concat_errors_on_intersecting_universes — the
    * reference raises; silently keeping both rows would corrupt every
    * downstream id-keyed op). One count-over-id window = one shuffle on
    * the union; prefer [[concat]] when ids are disjoint by construction
    * (e.g. [[concatReindex]] output). */
  def concatStrict(others: PwTable*): PwTable = {
    val u = others.foldLeft(df)((a, b) => a.unionByName(b.df))
    require(!u.columns.contains("_pw_dup"),
      "concatStrict reserves the column name _pw_dup")
    // window result materialized first: Spark rejects window functions
    // directly inside WHERE
    val flagged = u.withColumn("_pw_dup",
      count(lit(1)).over(Window.partitionBy(col(IdCol))))
    wrap(flagged.where(when(col("_pw_dup") > 1,
      raise_error(concat_ws(" ", lit("concat: intersecting universes at id"),
        col(IdCol).cast("string"))))
      .otherwise(lit(true))).drop("_pw_dup"))
  }

  /** Pathway `concat_reindex` (table.py:315): union with fresh ids (side-tagged hash). */
  def concatReindex(others: PwTable*): PwTable = {
    val tagged = (this +: others).zipWithIndex.map { case (t, i) =>
      t.df.withColumn(IdCol, Keys.pointerFrom(t.df(IdCol), lit(i)))
    }
    wrap(tagged.reduce(_ unionByName _))
  }

  /** Pathway `difference` (table.py:988): rows of this whose key ∉ other. */
  def difference(other: PwTable): PwTable =
    wrap(df.join(other.df.select(IdCol), Seq(IdCol), "left_anti"))

  /** Pathway `intersect` (table.py:1025): rows of this whose key ∈ every other. */
  def intersect(others: PwTable*): PwTable =
    wrap(others.foldLeft(df)((a, b) =>
      a.join(b.df.select(IdCol), Seq(IdCol), "left_semi")))

  /** Pathway `restrict` (table.py:1087): like intersect, asserting other ⊆ this. */
  def restrict(other: PwTable): PwTable = intersect(other)

  /** Reference `restrict` strict contract (tests/test_error_messages.py:723):
    * every id of `other` must exist in this table. A dangling id fails at
    * runtime with the reference's "key missing in output table" KeyError
    * (the un-promised static form "other universe has to be a subset of
    * self universe." has no Spark equivalent — universes are not tracked
    * statically; this runtime check is the enforcement point). */
  def restrictStrict(other: PwTable): PwTable = {
    val r = other.df.select(col(IdCol).as("_pw_restrict_id"))
    val joined = r.join(df, col("_pw_restrict_id") === col(IdCol), "left_outer")
    val checked = joined.where(when(col(IdCol).isNull,
      raise_error(lit("key missing in output table"))).otherwise(lit(true)))
    wrap(checked.drop("_pw_restrict_id"))
  }

  /** Pathway `with_universe_of` (table.py:2289): re-key this table onto `other`'s
    * universe — the key sets must match 1:1 (the reference's UniverseSolver
    * proves it statically; we enforce it at runtime via an inner join, and
    * callers can assert equal counts for the strict check). */
  def withUniverseOf(other: PwTable): PwTable =
    wrap(df.join(other.df.select(IdCol), Seq(IdCol), "inner"))

  /** Pathway `update_cells` / `<<` (table.py:1691): overwrite cells present in `other`
    * (matched by id); rows missing from `other` keep their values. */
  def updateCells(other: PwTable): PwTable = {
    // reference rejects columns absent from the updated table with this
    // exact message (tests/test_error_messages.py:602-627)
    val extra = other.columns.filterNot(columns.contains)
    if (extra.nonEmpty)
      throw new IllegalArgumentException(
        "Columns of the argument in Table.update_cells() not present in the " +
          s"updated table: [${extra.map(c => s"'$c'").mkString(", ")}].")
    val overlap = other.columns.filter(columns.contains)
    val r = other.df
      .select((IdCol +: overlap).map(col): _*)
      .withColumnsRenamed(overlap.map(c => c -> s"_new_$c").toMap)
    val joined = df.join(r, Seq(IdCol), "left_outer")
    val replaced = overlap.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(col(s"_new_$c"), col(c))))
    wrap(replaced.drop(overlap.map(c => s"_new_$c"): _*))
  }

  /** Pathway `update_rows` (table.py:1776): upsert whole rows, other wins. */
  def updateRows(other: PwTable): PwTable = {
    require(columns == other.columns || columns.toSet == other.columns.toSet,
      s"update_rows needs same columns: $columns vs ${other.columns}")
    val l = df.withColumnsRenamed(columns.map(c => c -> s"_l_$c").toMap)
    val r = other.df.withColumnsRenamed(columns.map(c => c -> s"_r_$c").toMap)
    val joined = l.join(r, Seq(IdCol), "full_outer")
    val merged = columns.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(col(s"_r_$c"), col(s"_l_$c"))))
    wrap(merged.select(col(IdCol) +: columns.map(col): _*))
  }

  // ───────────────────────────── re-keying / shape ─────────────────────────────

  /** Pathway `with_id_from` (table.py:1942): re-key from expression values. */
  def withIdFrom(cols: Column*): PwTable = {
    graft.functions.Futures.checkComputed(df, cols, "pathway.pointer_from")
    wrap(df.withColumn(IdCol, Keys.pointerFrom(cols: _*)))
  }

  /** Pathway `flatten` (table.py:2341): explode an iterable column; id = hash(origin, pos).
    * `withOrigin` keeps the pre-explosion id as `origin_id`. Rows with an
    * EMPTY iterable disappear (reference test_flatten); a STRING column
    * flattens into single characters (test_flatten_string); any other
    * type is rejected like the reference's "Cannot flatten column of
    * type INT." TypeError (r15 decode). */
  def flatten(colName: String, withOrigin: Boolean = false): PwTable = {
    // resolve the CANONICAL top-level column name once and use it
    // throughout: a case-insensitive session must not type-check against
    // one spelling and explode/drop against another (r15 review — the
    // mismatch kept the unexploded array inside _rest.* and made every
    // downstream reference ambiguous), and a nested path must hit the
    // clean error, not a late unresolved-column failure
    val caseSensitive =
      df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    val resolved = df.columns
      .find(c => if (caseSensitive) c == colName else c.equalsIgnoreCase(colName))
      .getOrElse(throw new IllegalArgumentException(
        s"Cannot flatten $colName: no such top-level column."))
    val iterable: Column = df.schema(resolved).dataType match {
      case _: org.apache.spark.sql.types.ArrayType => col(resolved)
      case org.apache.spark.sql.types.StringType =>
        regexp_extract_all(col(resolved), lit("(?s)."), lit(0))
      case other => throw new IllegalArgumentException(
        s"Cannot flatten column of type ${other.sql}.")
    }
    val exploded = df
      .select(col(IdCol).as("_pw_origin"), posexplode(iterable).as(Seq("_pw_pos", resolved)),
        struct(columns.filterNot(_ == resolved).map(col): _*).as("_rest"))
      .select(Keys.pointerFrom(col("_pw_origin"), col("_pw_pos")).as(IdCol),
        col("_pw_origin"), col(resolved), col("_rest.*"))
    val out = if (withOrigin) exploded.withColumnRenamed("_pw_origin", "origin_id")
              else exploded.drop("_pw_origin")
    wrap(out)
  }

  /** Pathway `sort` (table.py:2409): per-instance linked list — `prev`/`next` pointer
    * columns in `key` order. Window lag/lead replaces the reference's custom
    * prev_next operator (src/engine/dataflow/operators/prev_next.rs:775).
    * `instance` is REQUIRED: it is the window partition key — a constant would
    * funnel the whole table through one partition (pass the sharding column the
    * reference's `instance=` argument carries). */
  def sortWithPrevNext(keys: Seq[Column], instance: Column): PwTable = {
    graft.functions.Futures.checkUsable(df, keys :+ instance)
    val w = Window.partitionBy(instance).orderBy(keys: _*)
    wrap(df.withColumn("prev", lag(col(IdCol), 1).over(w))
           .withColumn("next", lead(col(IdCol), 1).over(w)))
  }

  /** Pathway `stdlib.ordered.diff` (stdlib/ordered/diff.py:10): value minus the value
    * k rows earlier in `keys` order (per instance). Pass a total order (include a
    * tie-break key) for deterministic results. `instance` is REQUIRED — it is
    * the window partition key; a constant funnels the table through one
    * partition (see sortWithPrevNext). */
  def diff(keys: Seq[Column], valueCol: Column, k: Int, instance: Column): PwTable = {
    graft.functions.Futures.checkUsable(df, keys ++ Seq(valueCol, instance))
    val w = Window.partitionBy(instance).orderBy(keys: _*)
    wrap(df.withColumn("diff", valueCol - lag(valueCol, k).over(w)))
  }

  /** Multi-column `pw.stdlib.ordered.diff(timestamp, *values)` — one window
    * pass producing `diff_<name>` per value column, the reference's output
    * shape (r16 decode of tests/ordered/test_diff.py). */
  def diffAll(keys: Seq[Column], values: Seq[(String, Column)], instance: Column): PwTable = {
    graft.functions.Futures.checkUsable(df, keys ++ values.map(_._2) :+ instance)
    val w = Window.partitionBy(instance).orderBy(keys: _*)
    wrap(values.foldLeft(df) { case (d, (name, c)) =>
      d.withColumn(s"diff_$name", c - lag(c, 1).over(w))
    })
  }
}

object PwTable {
  import Keys.IdCol

  /** Key by primary-key columns (Pathway connector `primary_key=`). */
  def fromPrimaryKey(df: DataFrame, pk: String*): PwTable =
    new PwTable(df.withColumn(IdCol, Keys.pointerFrom(pk.map(df(_)): _*)))

  /** Key by all columns (Pathway's auto-id from input; identical rows coalesce —
    * documented divergence from the reference's offset-derived ids). */
  def fromAllColumns(df: DataFrame): PwTable =
    new PwTable(df.withColumn(IdCol, Keys.pointerFrom(df.columns.map(df(_)): _*)))

  /** Wrap a DataFrame that already carries `_pw_id`. */
  def fromKeyed(df: DataFrame): PwTable = {
    require(df.columns.contains(IdCol), s"missing $IdCol")
    new PwTable(df)
  }

  /** Pathway `Table.empty` (table.py:362). */
  def empty(spark: SparkSession, schema: org.apache.spark.sql.types.StructType): PwTable = {
    val withId = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(IdCol, org.apache.spark.sql.types.LongType) +: schema.fields)
    new PwTable(spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withId))
  }
}

/** Deferred groupby (Pathway `GroupedTable`, internals/groupbys.py:71). */
final case class PwGrouped(table: PwTable, keys: Seq[(String, Column)]) {
  import Keys.IdCol

  /** Pathway `reduce` (groupbys.py:158): one aggregation pass; result id =
    * hash(grouping values). Spark gives partial (map-side) aggregation for free. */
  def reduce(aggs: (String, Column)*): PwTable = {
    // reference rejects a bare (non-grouped, non-reduced) column in reduce
    // with this exact message (tests/test_error_messages.py:457-478); a bare
    // column reference stringifies to its name, wrapped reducers don't.
    // This check runs FIRST so a bare future column still gets the decoded
    // bare-column text, not a dtype error.
    val keyNames = keys.map(_._1).toSet
    for ((_, c) <- aggs) {
      val s = c.toString
      if (!keyNames.contains(s) && table.columns.contains(s))
        throw new IllegalArgumentException(
          s"You cannot use <table1>.$s in this reduce statement.\n" +
            s"Make sure that <table1>.$s is used in a groupby or wrap it with " +
            s"a reducer, e.g. pw.reducers.count(<table1>.$s)")
    }
    // Future-typed columns can't feed a reducer until await_futures()
    // (tests/test_udf.py:1169 — names the reducer in the message)
    aggs.foreach { case (_, c) => graft.functions.Futures.checkReducer(table.df, c) }
    val keyCols = keys.map { case (n, c) => c.as(n) }
    val grouped = table.df
      .groupBy(keyCols: _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
    PwTable.fromKeyed(
      grouped.withColumn(IdCol, Keys.pointerFrom(keys.map { case (n, _) => col(n) }: _*)))
  }

  /** `groupby(id=<pointer col>)` (groupbys.py id=; r16 replay of
    * test_common.py test_groupby_setid): when grouping by a single POINTER
    * column, the pointer itself becomes the result id (no re-hash) — so the
    * reduced table stays addressable by the original keys (ix /
    * with_universe_of interop). `idKey` must be the (single) grouping
    * column holding the pointer. */
  def reduceWithId(idKey: String, aggs: (String, Column)*): PwTable = {
    // exact reference contract (tests/test_error_messages.py:579-599): the id
    // pointer must BE the single grouping column — extra grouping keys would
    // silently duplicate _pw_id values and break universe uniqueness
    if (keys.size > 1)
      throw new IllegalArgumentException(
        "Table.groupby() cannot have id argument when grouping by multiple columns.")
    if (keys.head._1 != idKey)
      throw new IllegalArgumentException(
        "Table.groupby() received id argument and is grouped by a single column," +
          " but the arguments are not equal.\n" +
          "Consider using <table>.groupby(id=...), skipping the positional argument.")
    val keyCols = keys.map { case (n, c) => c.as(n) }
    val grouped = table.df
      .groupBy(keyCols: _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
    PwTable.fromKeyed(grouped.withColumn(IdCol, col(idKey).cast("long")))
  }
}

/** Join result with deferred projection (Pathway `JoinResult`, joins.py:553). */
final case class PwJoinResult(joined: DataFrame, spark: SparkSession) {
  import Keys.IdCol

  /** Project; result id = hash(left_id, right_id) (joins.py id derivation). */
  def select(cols: (String, Column)*): PwTable = {
    cols.foreach { case (_, c) =>
      graft.functions.Futures.checkExpression(joined, c) }
    val withId = joined.withColumn(IdCol,
      Keys.pointerFrom(col(s"l.$IdCol"), col("_pw_id_r")))
    PwTable.fromKeyed(
      withId.select(col(IdCol) +: cols.map { case (n, c) => c.as(n) }: _*))
  }

  def filter(cond: Column): PwJoinResult = {
    graft.functions.Futures.checkExpression(joined, cond, allowBare = false)
    copy(joined = joined.filter(cond))
  }

  /** `join(…, id=left.id / right.id)` (joins.py:135 id override; r16 replay
    * of test_common.py test_join_left/right_assign_id): the result keys by
    * ONE side's id instead of hash(l, r) — valid only while that side's
    * rows match at most once; a duplicate raises the reference's runtime
    * KeyError. `side` ∈ "left" | "right". */
  def selectWithId(side: String, cols: (String, Column)*): PwTable = {
    val idCol = side match {
      case "left" => col(s"l.$IdCol")
      case "right" => col("_pw_id_r")
      case other => throw new IllegalArgumentException(
        s"id override must be left or right, got $other")
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(idCol)
    val guarded = joined
      .withColumn("_pw_idn", count(lit(1)).over(w))
      .where(when(col("_pw_idn") > 1, raise_error(concat(
        lit("duplicate key: "), idCol.cast("string")))).otherwise(lit(true)))
    PwTable.fromKeyed(guarded.withColumn(IdCol, idCol)
      .select(col(IdCol) +: cols.map { case (n, c) => c.as(n) }: _*))
  }
}
