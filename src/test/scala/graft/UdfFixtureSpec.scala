package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Udfs

/** Side-effect counters must live in an object (serialized by reference
  * into the single-JVM local executor). */
object UdfFixtureCounters {
  val propagateCalls = new AtomicInteger(0)
  val nonDetCalls = new AtomicInteger(0)
  val batchLengths = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
}

/** Replays the engine-relevant UDF semantics from tests/test_udf.py (r16):
  * propagate_none short-circuits without invoking the function,
  * non-deterministic UDFs are invoked exactly once per input row (the
  * batch analog of the reference's store-and-replay contract), the
  * declared return type casts the result, and max_batch_size batch UDFs
  * keep the 1:1 row contract with the reference's wrong-count error.
  * Python-executor machinery (async executors, disk caches, future
  * dtypes) is runtime plumbing, not engine semantics — out of scope,
  * documented in SURVEY. */
class UdfFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("test_udf_propagate_none: any null arg → null, function never invoked") {
    UdfFixtureCounters.propagateCalls.set(0)
    val add = Udfs.applyPropagateNone2[java.lang.Long, java.lang.Long, java.lang.Long] {
      (a, b) =>
        Predef.require(a != null && b != null)
        UdfFixtureCounters.propagateCalls.incrementAndGet()
        a + b
    }
    val in = Seq((Some(1L), Some(6L)), (Some(2L), None), (None, Some(8L)))
      .toDF("a", "b")
    val got = in.select(add(col("a"), col("b")).as("ret")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    assert(got == Set(Some(7L), None))
    assert(UdfFixtureCounters.propagateCalls.get() == 1)
  }

  test("test_udf_make_deterministic: non-deterministic UDF invoked exactly once per row") {
    UdfFixtureCounters.nonDetCalls.set(0)
    val inc = Udfs.apply1NonDeterministic[Long, Long] { a =>
      UdfFixtureCounters.nonDetCalls.incrementAndGet()
      a + 1
    }
    // reference the output column in BOTH a filter and a projection — a
    // deterministic UDF may legally be duplicated/pushed; the
    // non-deterministic contract forbids it
    val in = Seq(1L, 2L, 3L, 1L, 4L).toDF("a")
    val out = in.select(col("a"), inc(col("a")).as("ret"))
      .filter(col("ret") > 2).select(col("ret") * 2)
    assert(out.as[Long].collect().sorted.toSeq == Seq(6L, 8L, 10L))
    assert(UdfFixtureCounters.nonDetCalls.get() == 5)
  }

  test("test_cast_on_return: the declared return type drives downstream arithmetic") {
    // declared float return on an int-producing function (py:906) — the
    // typed wrapper's O=Double forces the widening at the boundary
    val f = Udfs.apply1[Long, Double](a => a.toDouble)
    val t = Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)).toDF("a", "b")
    val res = t.select((f(col("a")) + col("b")).as("c"))
    assert(res.schema("c").dataType.typeName == "double")
    assert(res.as[Double].collect().sorted.toSeq == Seq(2.5, 4.5, 6.5))
  }

  test("test_batch_udf_batching_correct: slices of ≤ max_batch_size, 1:1 output") {
    UdfFixtureCounters.batchLengths.clear()
    val in = spark.createDataset(Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L), (5L, 1L)))
      .repartition(1)
    val out = Udfs.batchUdf(in, maxBatchSize = 3) { batch =>
      UdfFixtureCounters.batchLengths.add(batch.size)
      batch.map { case (a, b) => a + b }
    }
    assert(out.collect().sorted.toSeq == Seq(2L, 2L, 4L, 4L, 6L))
    val lengths = {
      val it = UdfFixtureCounters.batchLengths.iterator()
      val b = Seq.newBuilder[Int]
      while (it.hasNext) b += it.next()
      b.result().sorted
    }
    assert(lengths == Seq(2, 3))
  }

  test("test_batch_udf_incorrect_rows_returned: the reference's wrong-count error") {
    val in = spark.createDataset(Seq((1L, 1L), (2L, 0L), (3L, 1L))).repartition(1)
    val bad = Udfs.batchUdf(in, maxBatchSize = 16) { batch =>
      batch.map { case (a, b) => a + b }.dropRight(1)
    }
    val e = intercept[Exception] { bad.collect() }
    assert(SparkTestBase.causeMessages(e).exists(_.contains(
      "The number of rows produced by a UDF (2) is different than the number of rows on its input (3).")))
  }

  test("test_udf_timeout / too_fast_for_timeout: a call past the budget " +
      "raises TimeoutException, fast calls pass (r17)") {
    import graft.functions.Udfs
    intercept[java.util.concurrent.TimeoutException] {
      Udfs.withTimeout(100L)(() => { Thread.sleep(2000); 42 })
    }
    assert((1 to 3).map(i => Udfs.withTimeout(10000L)(() => i + 1)) == Seq(2, 3, 4))
    // a failing call surfaces its own error, not a timeout
    val e = intercept[RuntimeException] {
      Udfs.withTimeout(10000L)(() => throw new RuntimeException("boom"))
    }
    assert(e.getMessage == "boom")
  }

  test("test_udf_in_memory_cache_with_limit: max_size=0 disables caching — " +
      "results stay correct, every call recomputes (r17)") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val inc = graft.functions.Udfs.cached[Int, Int](
      a => { calls.incrementAndGet(); a + 1 }, maxEntries = 0)
    assert(Seq(1, 1, 1).map(inc) == Seq(2, 2, 2))
    assert(calls.get() == 3)
  }
}
