package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import graft.functions.Udfs

/** AsyncTransformer (reference python/pathway/stdlib/utils/async_transformer.py:387):
  * rows flow through an external (async) worker and come back as a results
  * table with per-row completion status — failures become data, not job
  * aborts.
  *
  * Spark shape: one client per partition (≈ one per reference worker),
  * requests batched to amortize round-trips (udfs/executors.py async
  * batching), exponential-backoff retries around each batch call
  * (udfs/retries.py), optional per-executor memoization (udfs/caches.py).
  * After retries are exhausted the whole failed batch is marked failed
  * per-row (batch granularity — the endpoint call is the atomic unit here)
  * and the pipeline continues; split failures off with [[failures]] as the
  * side-table.
  *
  * Intra-partition input order is preserved (mapPartitions streams the
  * iterator in order) — the reference's completion tracking guarantee that
  * downstream consumers see results in a deterministic order.
  */
object AsyncTransformer {

  /** (input, result, error): exactly one of result/error is defined. */
  type Attempt[I, O] = (I, Option[O], Option[String])

  /** Run `call` over `ds` in per-partition batches with retries; failures
    * become rows. `cacheSize` > 0 memoizes single-row calls per executor
    * (only exercised for batch size 1 — caching a whole batch's result under
    * the batch key would conflate unrelated rows). */
  def transform[I, O](ds: Dataset[I], batchSize: Int = 64, maxRetries: Int = 3,
      initialDelayMs: Long = 10, cacheSize: Int = 0)(setup: () => AnyRef)(
      call: (AnyRef, Seq[I]) => Seq[O])(
      implicit enc: Encoder[Attempt[I, O]]): Dataset[Attempt[I, O]] =
    ds.mapPartitions { it =>
      val client = setup()
      val invoke: Seq[I] => Seq[O] =
        if (cacheSize > 0 && batchSize == 1) {
          val cached1 = Udfs.cached[I, O](
            i => Udfs.withRetries(maxRetries, initialDelayMs)(() => call(client, Seq(i)).head),
            cacheSize)
          batch => batch.map(cached1)
        } else {
          batch => Udfs.withRetries(maxRetries, initialDelayMs)(() => call(client, batch))
        }
      it.grouped(batchSize).flatMap { batch =>
        try {
          val out = invoke(batch.toSeq)
          require(out.size == batch.size,
            s"endpoint returned ${out.size} results for ${batch.size} inputs")
          batch.lazyZip(out).map((i, o) => (i, Some(o), Option.empty[String]))
        } catch {
          case e: Throwable =>
            batch.map(i => (i, Option.empty[O], Some(String.valueOf(e.getMessage))))
        }
      }
    }

  /** Completed rows: (input, result). */
  def successes[I, O](attempts: Dataset[Attempt[I, O]])(
      implicit enc: Encoder[(I, O)]): Dataset[(I, O)] =
    attempts.flatMap(a => a._2.map(o => (a._1, o)))

  /** The failure side-table: (input, error message). */
  def failures[I, O](attempts: Dataset[Attempt[I, O]])(
      implicit enc: Encoder[(I, String)]): Dataset[(I, String)] =
    attempts.flatMap(a => a._3.map(m => (a._1, m)))
}
