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
            // messageless exceptions keep the class name (not the string "null")
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            batch.map(i => (i, Option.empty[O], Some(msg)))
        }
      }
    }

  /** `_async_status` values of the `finished` table
    * (async_transformer.py _ASYNC_STATUS_COLUMN; pinned by
    * tests/test_async_transformer.py:329-335). */
  val StatusSuccess = "-SUCCESS-"
  val StatusFailure = "-FAILURE-"

  /** Instance-grouped variant (async_transformer.py `instance=`): rows
    * sharing an instance value complete TOGETHER, and one failing row fails
    * the WHOLE instance (tests/test_async_transformer.py
    * test_fails_whole_instance:348 — both rows of instance 1 come back
    * `-FAILURE-` when only one raised; test_with_instance:263 — each
    * instance's results commit as one group). Spark shape: groupByKey on
    * the instance, per-group invoke, group-atomic success/failure. */
  def transformInstanced[I, K, O](ds: Dataset[I], instanceOf: I => K,
      maxRetries: Int = 1, initialDelayMs: Long = 1)(call: I => O)(
      implicit ke: Encoder[K], enc: Encoder[Attempt[I, O]]): Dataset[Attempt[I, O]] =
    ds.groupByKey(instanceOf).flatMapGroups { (_: K, it: Iterator[I]) =>
      val rows = it.toSeq
      val attempts = rows.map { r =>
        r -> scala.util.Try(Udfs.withRetries(maxRetries, initialDelayMs)(() => call(r)))
      }
      attempts.collectFirst { case (_, scala.util.Failure(e)) => e } match {
        case Some(e) =>
          // messageless exceptions (e.g. bare NPE) keep the class name
          // instead of rendering as the literal string "null"
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          rows.iterator.map(r => (r, Option.empty[O], Some(msg)))
        case None =>
          attempts.iterator.map { case (r, t) => (r, Some(t.get), Option.empty[String]) }
      }
    }

  /** The reference's invoke-signature validation
    * (async_transformer.py __init__; exact messages pinned by
    * tests/test_async_transformer.py:407-435). */
  def validateInvokeArgs(inputColumns: Seq[String], invokeArgs: Seq[String]): Unit = {
    for (c <- inputColumns if !invokeArgs.contains(c))
      throw new IllegalArgumentException(
        s"Input table has a column '$c' but it is not present on the argument " +
          "list of the invoke method.")
    for (a <- invokeArgs if !inputColumns.contains(a))
      throw new IllegalArgumentException(
        s"Column '$a' is present on the argument list of the invoke method " +
          "but it is not present in the input_table.")
  }

  /** The reference's result-schema check: invoke must return exactly the
    * declared output columns or the row FAILS (not errors the job) —
    * tests/test_async_transformer.py test_assert_schema_error:186. */
  def checkResultSchema[O](declared: Set[String])(result: Map[String, O]): Map[String, O] = {
    require(result.keySet == declared,
      s"invoke result keys ${result.keySet.toSeq.sorted.mkString(",")} do not match " +
        s"the output schema ${declared.toSeq.sorted.mkString(",")}")
    result
  }

  /** Completed rows: (input, result). */
  def successes[I, O](attempts: Dataset[Attempt[I, O]])(
      implicit enc: Encoder[(I, O)]): Dataset[(I, O)] =
    attempts.flatMap(a => a._2.map(o => (a._1, o)))

  /** The `finished` table: every row with its `-SUCCESS-`/`-FAILURE-`
    * status (async_transformer.py `finished`; successful results carried,
    * failures padded with None). */
  def finished[I, O](attempts: Dataset[Attempt[I, O]])(
      implicit enc: Encoder[(I, String, Option[O])]): Dataset[(I, String, Option[O])] =
    attempts.map(a =>
      (a._1, if (a._2.isDefined) StatusSuccess else StatusFailure, a._2))

  /** The failure side-table: (input, error message). */
  def failures[I, O](attempts: Dataset[Attempt[I, O]])(
      implicit enc: Encoder[(I, String)]): Dataset[(I, String)] =
    attempts.flatMap(a => a._3.map(m => (a._1, m)))
}
