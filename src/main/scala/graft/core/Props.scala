package graft.core

/** Static append-only property calculus (reference
  * internals/column_properties.py — PreserveDependencies/UpdateRows/
  * UpdateCells/Join/PromiseSameUniverse/AppendOnly/Default evaluators —
  * replayed vector-by-vector from tests/test_column_properties.py).
  *
  * The reference computes, at graph-build time, whether each column (and
  * each table's id/universe) is provably append-only; stateful streaming
  * operators use the flag to pick cheaper append-only kernels and
  * `assert_append_only` gates enforce it. Here the same calculus is a
  * standalone analyzer over the engine's operator DAG: a pipeline carries a
  * [[TableProps]] alongside its PwTable, updating it with the matching rule
  * at every operator — then [[PwSchema.assertAppendOnly]]-style gates (e.g.
  * asof_now's left side, dedupAcceptor's instance) can be checked statically
  * for plans where Catalyst's field-metadata propagation (projections only)
  * is too weak.
  *
  * Decoded rules (column flags are per NAME; `id` is the universe flag):
  *   - a SOURCE table's id is the OR of its column flags (a row first
  *     appears with its first inserted column)
  *   - expression columns AND together their dependencies' flags; contexts
  *     contribute their own dependencies (a filter's condition, a buffer's
  *     threshold) to every output column
  *   - inner equi-joins AND the two key-dependency flags into the id; any
  *     outer ear clears everything
  *   - update_rows/update_cells clear all value columns (an update is a
  *     retract+insert); difference and sort's prev/next are never
  *     append-only; _remove_retractions makes everything append-only
  */
final case class TableProps(id: Boolean, cols: Map[String, Boolean]) {
  def col(n: String): Boolean = cols.getOrElse(n,
    throw new IllegalArgumentException(s"unknown column $n (have ${cols.keys.mkString(",")})"))
  private[core] def and(flag: Boolean): TableProps =
    TableProps(id && flag, cols.view.mapValues(_ && flag).toMap)
}

object Props {

  /** Table from a connector/schema: per-column flags as declared; the
    * universe is append-only iff ANY column is (test_universe_properties /
    * test_buffer_2's id). A schema-level `append_only=True` sets all. */
  def source(cols: Map[String, Boolean]): TableProps =
    TableProps(cols.values.exists(identity), cols)

  def source(schema: PwSchema): TableProps =
    source(schema.cols.map(c => c.name -> c.appendOnly).toMap)

  /** select / with_columns (PreserveDependenciesPropsEvaluator): every
    * output column ANDs the flags of the columns its expression depends on;
    * the universe is unchanged. `deps` maps output name → referenced input
    * names (a plain rename/ref is a single dep). Dependencies on OTHER
    * same-universe tables pass their flags in via `extra`. */
  def select(in: TableProps, deps: Map[String, Set[String]],
      extra: Map[String, Boolean] = Map.empty): TableProps = {
    def flagOf(d: String): Boolean = in.cols.getOrElse(d, extra(d))
    TableProps(in.id, deps.map { case (out, ds) => out -> ds.forall(flagOf) })
  }

  /** filter: the condition's dependencies AND into every column and the id
    * (test_preserve_context_dependency_properties — a condition referencing
    * a non-append-only column clears the whole output). */
  def filter(in: TableProps, condDeps: Set[String],
      extra: Map[String, Boolean] = Map.empty): TableProps = {
    def flagOf(d: String): Boolean = in.cols.getOrElse(d, extra(d))
    in.and(condDeps.forall(flagOf))
  }

  /** _buffer / _freeze (test_buffer/test_buffer_2, test_freeze): the
    * threshold/instance expressions' dependencies gate the output id, and
    * every column ANDs with that id — a non-append-only release column can
    * reorder releases, so no column survives unless the gate itself is
    * append-only. */
  def buffer(in: TableProps, gateDeps: Set[String]): TableProps = {
    val gate = gateDeps.forall(in.col)
    TableProps(in.id && gate, in.cols.view.mapValues(_ && in.id && gate).toMap)
  }

  /** with_id_from / reindex (test_reindex_2): the new id depends on the
    * reindex expression's columns (AND the old universe); columns AND with
    * the new id. */
  def reindex(in: TableProps, idDeps: Set[String]): TableProps = {
    val newId = in.id && idDeps.forall(in.col)
    TableProps(newId, in.cols.view.mapValues(_ && newId).toMap)
  }

  /** ix / ix_ref (test_ix): fetched columns AND the pointer column's flag,
    * the source table's flag, and STRICTNESS — allow_misses=True clears
    * them (a miss that later fills is an update). The universe is the
    * key table's. */
  def ix(keys: TableProps, pointerDeps: Set[String], values: TableProps,
      allowMisses: Boolean): TableProps = {
    val ptr = pointerDeps.forall(keys.col)
    TableProps(keys.id,
      values.cols.view.mapValues(v =>
        keys.id && ptr && values.id && v && !allowMisses).toMap)
  }

  /** intersect / restrict / having (test_intersect_2/test_restrict_2/
    * test_having_2): the OTHER table's universe ANDs into id and columns. */
  def intersect(in: TableProps, others: Boolean*): TableProps =
    in.and(others.forall(identity))

  /** difference: never append-only (DefaultPropsEvaluator — a row can
    * disappear when the subtrahend catches up). */
  def difference(in: TableProps): TableProps =
    TableProps(id = false, in.cols.view.mapValues(_ => false).toMap)

  /** update_rows (UpdateRowsPropsEvaluator): id = AND of both universes;
    * every value column is cleared (overlap keys update in place). */
  def updateRows(left: TableProps, right: TableProps): TableProps =
    TableProps(left.id && right.id, left.cols.view.mapValues(_ => false).toMap)

  /** update_cells (UpdateCellsPropsEvaluator): id = LEFT universe only (the
    * right is a promised subset); value columns cleared. */
  def updateCells(left: TableProps): TableProps =
    TableProps(left.id, left.cols.view.mapValues(_ => false).toMap)

  /** concat / concat_reindex (test_concat_2): id = AND of universes, each
    * column = AND of the two sides' flags. */
  def concat(left: TableProps, right: TableProps): TableProps =
    TableProps(left.id && right.id,
      left.cols.map { case (n, f) => n -> (f && right.col(n)) })

  /** with_universe_of (PromiseSameUniversePropsEvaluator): id = OR of the
    * two universes (the reference warns when they disagree); columns keep
    * their own dependency flags. */
  def withUniverseOf(in: TableProps, other: TableProps): TableProps =
    TableProps(in.id || other.id, in.cols)

  /** inner join (JoinPropsEvaluator, exact_match): the id ANDs the key
    * columns' flags from both sides; output columns AND their source flag
    * with the id. `leftKeyDeps`/`rightKeyDeps` are the ON-clause columns
    * (an id-to-id join passes Set.empty and the universes gate). */
  def joinInner(left: TableProps, leftKeyDeps: Set[String],
      right: TableProps, rightKeyDeps: Set[String]): TableProps = {
    val idFlag =
      (if (leftKeyDeps.isEmpty) left.id else leftKeyDeps.forall(left.col)) &&
      (if (rightKeyDeps.isEmpty) right.id else rightKeyDeps.forall(right.col))
    TableProps(idFlag,
      (left.cols ++ right.cols).view.mapValues(_ && idFlag).toMap)
  }

  /** left/right/outer join: never append-only (JoinPropsEvaluator ears —
    * an unmatched row's nulls retract when a match arrives). */
  def joinOuter(left: TableProps, right: TableProps): TableProps =
    TableProps(id = false, (left.cols ++ right.cols).view.mapValues(_ => false).toMap)

  /** flatten (test_flatten_2): the flattened column's flag gates the new
    * universe; other columns AND with it. */
  def flatten(in: TableProps, flattenCol: String): TableProps = {
    val newId = in.id && in.col(flattenCol)
    TableProps(newId, in.cols.view.mapValues(_ && newId).toMap)
  }

  /** sort → prev/next (test_sorting): the sorted table's own columns keep
    * their flags, prev/next are NEVER append-only (neighbors change as rows
    * arrive). */
  def sort(in: TableProps): TableProps =
    TableProps(in.id, in.cols ++ Map("prev" -> false, "next" -> false))

  /** remove_errors (test_remove_errors_2): flags pass through unchanged. */
  def removeErrors(in: TableProps): TableProps = in

  /** _remove_retractions (AppendOnlyPropsEvaluator): everything is
    * append-only BY CONSTRUCTION — deletions are dropped. */
  def removeRetractions(in: TableProps): TableProps =
    TableProps(id = true, in.cols.view.mapValues(_ => true).toMap)

  /** groupby().reduce(): aggregates update in place — never append-only
    * (DefaultPropsEvaluator on the reduce context). */
  def reduce(outCols: Set[String]): TableProps =
    TableProps(id = false, outCols.map(_ -> false).toMap)
}
