package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** UDF surface (reference pw.apply internals/common.py:96, @pw.udf
  * internals/udfs/__init__.py:299 with sync/async executors, caching, retries).
  *
  * Policy (SURVEY.md §2.3): built-in expressions beat UDFs — they stay inside
  * whole-stage codegen. These wrappers exist for the genuinely custom cases,
  * and the async path batches per partition exactly where the reference runs
  * its async executors (one client per worker, batched calls).
  */
object Udfs {

  /** pw.apply / apply_with_type: a typed scalar UDF. */
  def apply1[I: scala.reflect.runtime.universe.TypeTag,
      O: scala.reflect.runtime.universe.TypeTag](f: I => O): Column => Column = {
    val u = udf(f)
    (c: Column) => u(c)
  }

  def apply2[A: scala.reflect.runtime.universe.TypeTag,
      B: scala.reflect.runtime.universe.TypeTag,
      O: scala.reflect.runtime.universe.TypeTag](f: (A, B) => O): (Column, Column) => Column = {
    val u = udf(f)
    (a: Column, b: Column) => u(a, b)
  }

  /** `propagate_none=True` (r16 decode of test_udf.py:298/1763): ANY null
    * argument short-circuits the call to null — the function body is never
    * invoked for that row (the reference asserts the mock fires exactly
    * once on the all-present row). The default (False) passes nulls
    * through to the function — use boxed argument types for that route,
    * since Spark's primitive-typed UDFs null-skip on their own. */
  def applyPropagateNone2[A: scala.reflect.runtime.universe.TypeTag,
      B: scala.reflect.runtime.universe.TypeTag,
      O: scala.reflect.runtime.universe.TypeTag](
      f: (A, B) => O): (Column, Column) => Column = {
    val u = udf(f)
    (a: Column, b: Column) =>
      when(a.isNull || b.isNull, lit(null)).otherwise(u(a, b))
  }

  /** `deterministic=False` (test_udf.py:336/943): the reference STORES a
    * non-deterministic UDF's results and replays them on retraction rather
    * than re-invoking. The batch analog of that contract: mark the UDF
    * non-deterministic so Catalyst can never duplicate, collapse, or push
    * the call — exactly one invocation per input row, regardless of how
    * many plan sites reference the output. */
  def apply1NonDeterministic[I: scala.reflect.runtime.universe.TypeTag,
      O: scala.reflect.runtime.universe.TypeTag](f: I => O): Column => Column = {
    val u = udf(f).asNondeterministic()
    (c: Column) => u(c)
  }

  /** `max_batch_size` batch UDF (test_udf.py:1480/1526/1618): rows reach
    * the function in slices of at most `maxBatchSize`, and the output MUST
    * be 1:1 with the input — the reference's wrong-count ValueError is
    * replicated verbatim. For flatMap-shaped batching use [[mapBatches]]. */
  def batchUdf[I, O](ds: Dataset[I], maxBatchSize: Int)(call: Seq[I] => Seq[O])(
      implicit enc: Encoder[O]): Dataset[O] =
    ds.mapPartitions { it =>
      it.grouped(maxBatchSize).flatMap { g =>
        val batch = g.toSeq
        val out = call(batch)
        if (out.size != batch.size) throw new IllegalArgumentException(
          s"The number of rows produced by a UDF (${out.size}) is different " +
            s"than the number of rows on its input (${batch.size}).")
        out
      }
    }

  /** apply_async (common.py:170) — per-partition batched execution: `setup`
    * builds one client per partition (≈ per reference worker), `call` handles a
    * whole batch (amortized round-trips), mirroring udfs/executors.py's async
    * batching. Use for embedder/LLM endpoints. */
  def mapBatches[I, O](ds: Dataset[I], batchSize: Int)(setup: () => AnyRef)(
      call: (AnyRef, Seq[I]) => Seq[O])(implicit enc: Encoder[O]): Dataset[O] =
    ds.mapPartitions { it =>
      val client = setup()
      it.grouped(batchSize).flatMap(batch => call(client, batch.toSeq))
    }

  /** Deterministic-UDF cache (udfs/caches.py InMemoryCache): per-executor
    * memoization of a pure function. At scale this is a per-JVM LRU — the
    * reference's cache is likewise per-worker. */
  def cached[I, O](f: I => O, maxEntries: Int = 100000): I => O = {
    // InMemoryCache(max_size=0) stores nothing — every call recomputes
    // (r17 decode of test_udf.py test_udf_in_memory_cache_with_limit; the
    // clear-before-insert loop below would still serve the just-inserted
    // entry on the next hit)
    if (maxEntries <= 0) return f
    // ConcurrentHashMap forbids the mapping function from mutating the map
    // (clear() inside computeIfAbsent can deadlock under concurrent executor
    // threads), so the bound check runs BEFORE the lookup. clear() is a crude
    // full eviction but keeps the structure lock-free on the hit path; a
    // per-executor cache is best-effort, matching udfs/caches.py InMemoryCache.
    val cache = new java.util.concurrent.ConcurrentHashMap[I, O]()
    (i: I) => {
      if (cache.size() >= maxEntries && !cache.containsKey(i)) cache.clear()
      cache.computeIfAbsent(i, k => f(k))
    }
  }

  /** Per-call timeout (udfs/executors.py `async_executor(timeout=…)`;
    * r17 decode of test_udf.py test_udf_timeout / too_fast_for_timeout):
    * a call running past `timeoutMs` raises TimeoutException — the row
    * errors like the reference's asyncio TimeoutError — while fast calls
    * pass through untouched. The worker thread is daemonized and
    * interrupted so a hung call can't pin the executor. */
  // Shared cached daemon pool for withTimeout: per-row thread creation on
  // the UDF hot path would cost a Thread per call and leak one per hung,
  // uninterruptible call; a cached pool reuses idle workers (only a truly
  // stuck call holds a thread, and it is interrupted first).
  private lazy val timeoutPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-udf-timeout")
      t.setDaemon(true); t
    })

  def withTimeout[O](timeoutMs: Long)(f: () => O): O = {
    val fut = timeoutPool.submit(() => f(): O)
    try fut.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        fut.cancel(true)
        throw new java.util.concurrent.TimeoutException(
          s"UDF call exceeded $timeoutMs ms")
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }
  }

  /** Retry policy (udfs/retries.py ExponentialBackoffRetryStrategy). */
  def withRetries[O](maxRetries: Int = 3, initialDelayMs: Long = 100)(f: () => O): O = {
    var attempt = 0
    var delay = initialDelayMs
    var out: Option[O] = None
    while (out.isEmpty) {
      try out = Some(f())
      catch {
        case e: Throwable if attempt < maxRetries =>
          Thread.sleep(delay); delay *= 2; attempt += 1
        case e: Throwable => throw e
      }
    }
    out.get
  }
}
