package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Fixed-point iteration of a DataFrame transformation (reference
  * `pw.iterate`, python/pathway/internals/common.py:39; engine loop
  * src/engine/dataflow.rs:5046 via timely Variable loops).
  *
  * Spark has no dataflow loop primitive, so the driver re-evaluates the step
  * function until the result stops changing (or `maxIterations`). Each pass is
  * persisted and localCheckpointed so the lineage does NOT grow with the
  * iteration count — unbounded lineage is the classic Spark iterative-job
  * failure mode (stack overflows in the planner at scale).
  *
  * Batch-only by design: the reference supports iterate over streams via
  * timely loops; we document that divergence (SURVEY.md known-hard #3).
  *
  * Convergence check: `step` output must be deterministic; we compare via
  * `exceptAll` count (multiset equality) which shuffles once per pass — at
  * scale pass a cheaper `converged` predicate (e.g. an aggregate delta).
  */
object Iterate {

  def fixpoint(initial: DataFrame, step: DataFrame => DataFrame,
      maxIterations: Int = 50,
      converged: (DataFrame, DataFrame) => Boolean = defaultConverged): DataFrame = {
    var current = initial.persist(StorageLevel.MEMORY_AND_DISK).localCheckpoint(true)
    var i = 0
    var done = false
    while (i < maxIterations && !done) {
      val next = step(current).persist(StorageLevel.MEMORY_AND_DISK).localCheckpoint(true)
      done = converged(current, next)
      current.unpersist()
      current = next
      i += 1
    }
    current
  }

  /** Multiset equality via two anti-joins; exact but costs a shuffle. */
  def defaultConverged(prev: DataFrame, next: DataFrame): Boolean =
    next.exceptAll(prev).isEmpty && prev.exceptAll(next).isEmpty

  /** Run a fixed number of passes (no convergence check) — for algorithms with
    * a pinned iteration count (e.g. pagerank-k). */
  def nTimes(initial: DataFrame, step: DataFrame => DataFrame, n: Int): DataFrame =
    fixpoint(initial, step, n, (_, _) => false)
}
