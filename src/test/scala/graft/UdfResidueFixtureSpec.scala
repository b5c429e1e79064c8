package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DiskCache, Udfs}
import graft.operators.UdfChangelog

/** r18 close-out of the engine-relevant residue of tests/test_udf.py
  * (2,112 LoC): the changelog UDF-result STORAGE policies (943/976/1023/
  * 1813/1869/2014), the on-disk cache hygiene contract (441/488/1924/1968)
  * and the shared in-memory cache (831). Per-arg counters (the reference's
  * own distribution-safe trick, test_udf.py:1820) make every expected value
  * independent of row placement. */
object UdfResidueCounters {
  val perArg = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
  def count(a: Long): Long = perArg.merge(a, 1L, (x, y) => x + y)
  val calls = new java.util.concurrent.atomic.AtomicLong()

  // top-level function value so the flatMapGroups closure never captures
  // the (non-serializable) suite instance
  val counterUdf: Seq[Any] => Any = { args =>
    val a = args.head.asInstanceOf[Long]
    calls.incrementAndGet()
    10 * a + count(a)
  }
}

class UdfResidueFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val counterUdf = UdfResidueCounters.counterUdf

  private def reset(): Unit = {
    UdfResidueCounters.perArg.clear(); UdfResidueCounters.calls.set(0)
  }

  test("StoredTemporarily: retraction replays the ORIGINAL value and evicts; " +
      "re-insertion computes fresh (test_udf.py:1813 vector, bit-exact)") {
    reset()
    val changelog = Seq(
      (1L, 2L, 1), (1L, 4L, -1), (1L, 6L, 1), (2L, 8L, 1), (1L, 10L, -1)
    ).toDF("a", "time", "diff")
    val out = UdfChangelog(changelog, "a", Seq("a"), "time", "diff",
      UdfChangelog.StoredTemporarily, "x", LongType)(counterUdf)
    val got = out.select("a", "x", "time", "diff").as[(Long, Long, Long, Int)]
      .collect().toSet
    assert(got == Set((1L, 11L, 2L, 1), (1L, 11L, 4L, -1), (1L, 12L, 6L, 1),
      (2L, 21L, 8L, 1), (1L, 12L, 10L, -1)))
    assert(UdfResidueCounters.calls.get() == 3) // one per insertion only
  }

  test("StoredTemporarily: same-timestamp transient insert of a DEAD key " +
      "consolidates to a differential no-op, never an error (r18 review)") {
    reset()
    // (+1, -1) of identical content at t=4 cancels; the surviving history
    // is insert@2 / retract@6 — and the transient pair runs NO udf call
    val changelog = Seq(
      (1L, 2L, 1), (7L, 4L, 1), (7L, 4L, -1), (1L, 6L, -1)
    ).toDF("a", "time", "diff")
    val out = UdfChangelog(changelog, "a", Seq("a"), "time", "diff",
      UdfChangelog.StoredTemporarily, "x", LongType)(counterUdf)
    val got = out.select("a", "x", "time", "diff").as[(Long, Long, Long, Int)]
      .collect().toSet
    assert(got == Set((1L, 11L, 2L, 1), (1L, 11L, 6L, -1)))
    assert(UdfResidueCounters.calls.get() == 1, "cancelled pair never computes")
    // an upsert of a LIVE key at one timestamp (different content) is NOT
    // consolidated: retraction replays, insertion computes fresh
    reset()
    val upsert = Seq((1L, 2L, 2L, 1), (1L, 2L, 4L, -1), (1L, 3L, 4L, 1))
      .toDF("a", "b", "time", "diff")
    val out2 = UdfChangelog(upsert, "a", Seq("a"), "time", "diff",
      UdfChangelog.StoredTemporarily, "x", LongType)(counterUdf)
    assert(out2.select("b", "x", "diff").as[(Long, Long, Int)].collect().toSet
      == Set((2L, 11L, 1), (2L, 11L, -1), (3L, 12L, 1)))
    assert(UdfResidueCounters.calls.get() == 2)
  }

  test("StoredForever (append-only argument column): first result per key " +
      "served to every later change, UDF runs once per key " +
      "(test_udf.py:976/1869 vector)") {
    reset()
    val changelog = Seq(
      (1L, 1L, 2L, 2L, 1), (2L, 2L, 3L, 4L, 1), (1L, 1L, 2L, 6L, -1),
      (1L, 1L, 4L, 6L, 1), (3L, 3L, 5L, 8L, 1), (3L, 3L, 5L, 10L, -1),
      (3L, 3L, 6L, 10L, 1)
    ).toDF("id", "a", "b", "time", "diff")
    val out = UdfChangelog(changelog, "id", Seq("a"), "time", "diff",
      UdfChangelog.StoredForever, "x", LongType)(counterUdf)
    val got = out.select("id", "x", "b", "time", "diff")
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 11L, 2L, 2L, 1), (2L, 21L, 3L, 4L, 1),
      (1L, 11L, 2L, 6L, -1), (1L, 11L, 4L, 6L, 1), (3L, 31L, 5L, 8L, 1),
      (3L, 31L, 5L, 10L, -1), (3L, 31L, 6L, 10L, 1)))
    assert(UdfResidueCounters.calls.get() == 3)
    assert(UdfResidueCounters.perArg.get(1L) == 1L &&
      UdfResidueCounters.perArg.get(3L) == 1L)
  }

  test("NotStored (table declared append-only): nothing stored — every " +
      "changelog row recomputes, so a retraction may carry a DIFFERENT " +
      "value than its insertion (test_udf.py:943)") {
    reset()
    val changelog = Seq(
      (1L, 2L, 1), (2L, 4L, 1), (1L, 6L, -1), (3L, 8L, 1), (3L, 10L, -1)
    ).toDF("a", "time", "diff")
    val out = UdfChangelog(changelog, "a", Seq("a"), "time", "diff",
      UdfChangelog.NotStored, "x", LongType)(counterUdf)
    val got = out.select("a", "x", "diff").as[(Long, Long, Int)].collect().toSet
    // 5 invocations, per-arg counters advance on the retractions too
    assert(got == Set((1L, 11L, 1), (2L, 21L, 1), (1L, 12L, -1),
      (3L, 31L, 1), (3L, 32L, -1)))
    assert(UdfResidueCounters.calls.get() == 5)
  }

  test("second insertion of a LIVE key raises the reference's " +
      "'Expected deletion of a row with key' error (test_udf.py:2014)") {
    reset()
    val changelog = Seq(
      (1L, 1L, 2L, 1), (2L, 5L, 2L, 1), (2L, 5L, 4L, -1), (1L, 2L, 6L, 1)
    ).toDF("id", "a", "time", "diff")
    val out = UdfChangelog(changelog, "id", Seq("a"), "time", "diff",
      UdfChangelog.StoredTemporarily, "x", LongType)(counterUdf)
    val e = intercept[Exception] { out.collect() }
    assert(SparkTestBase.causeMessages(e).exists(
      _.contains("Expected deletion of a row with key")), e.toString)
  }

  // ── on-disk cache (DiskCache) ────────────────────────────────────────────

  private def binFiles(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.endsWith(".bin")).toSeq

  test("DiskCache.wrap: one invocation per distinct arg (test_udf_cache " +
      "vector: inputs 1,2,2,3,1 → 3 calls, values a+1)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-udfcache").toString
    val cache = new DiskCache(dir)
    var calls = 0
    val inc = cache.wrap { (a: Long) => calls += 1; a + 1 }
    val got = Seq(1L, 2L, 2L, 3L, 1L).map(inc)
    assert(got == Seq(2L, 3L, 3L, 4L, 2L))
    assert(calls == 3)
    cache.close()
    assert(binFiles(dir).isEmpty)
  }

  test("DiskCache with a size_limit too small for one entry fails loudly " +
      "with the KeyError shape — never a silent recompute (test_udf.py:488)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-udfcache").toString
    val cache = new DiskCache(dir, sizeLimit = 10)
    val inc = cache.wrap { (a: Long) => a + 1 }
    val e = intercept[NoSuchElementException] { inc(1L) }
    assert(e.getMessage.contains("KeyError"))
    cache.close()
  }

  test("cache directory hygiene: dead-run files are removed unread, an " +
      "own-name leftover is wiped on open, and close leaves the directory " +
      "empty (test_udf.py:1924)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-udfcache")
    // a pid beyond pid_max is never alive
    val stale = dir.resolve("run-999999999-worker-0-op-0.bin")
    java.nio.file.Files.write(stale, "leftover garbage from a crashed run".getBytes)
    val pid = ProcessHandle.current().pid()
    val ownLeftover = dir.resolve(s"run-$pid-worker-0-op-0.bin")
    java.nio.file.Files.write(ownLeftover, "not a valid cache file".getBytes)
    val cache = new DiskCache(dir.toString, op = "0", worker = 0)
    assert(!java.nio.file.Files.exists(stale), "stale dead-run file must be deleted")
    var calls = 0
    val inc = cache.wrap { (a: Long) => calls += 1; a + 1 }
    assert(inc(2L) == 3L && calls == 1) // leftover wiped, not read
    cache.close()
    assert(binFiles(dir.toString).isEmpty)
  }

  test("multiple workers own distinct cache files and each removes its own " +
      "on close (test_udf.py:1968)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-udfcache").toString
    val w0 = new DiskCache(dir, worker = 0)
    val w1 = new DiskCache(dir, worker = 1)
    w0.put("k", 1L); w1.put("k", 2L)
    val pid = ProcessHandle.current().pid()
    assert(binFiles(dir).toSet == Set(s"run-$pid-worker-0-op-0.bin",
      s"run-$pid-worker-1-op-0.bin"))
    assert(w0.get("k").contains(1L) && w1.get("k").contains(2L)) // no cross-talk
    w0.close(); w1.close()
    assert(binFiles(dir).isEmpty)
  }

  test("DiskCache evicts oldest-first under the byte budget") {
    val dir = java.nio.file.Files.createTempDirectory("graft-udfcache").toString
    val cache = new DiskCache(dir, sizeLimit = 300)
    cache.put("a", 1L); cache.put("b", 2L); cache.put("c", 3L)
    // each serialized Long entry is ~80 bytes; the third insert must push
    // out the oldest, never the newest
    assert(cache.get("c").contains(3L))
    assert(cache.get("a").isEmpty || cache.get("b").nonEmpty,
      "eviction must be oldest-first")
    cache.close()
  }

  test("a shared in-memory cache serves MULTIPLE call sites of the same " +
      "UDF: distinct args invoked once across both sites (test_udf.py:831)") {
    UdfResidueCounters.calls.set(0)
    val shared = Udfs.cached({ (a: Long) =>
      UdfResidueCounters.calls.incrementAndGet(); a + 1
    }, maxEntries = 100)
    val in = Seq(1L, 2L, 1L, 2L, 3L).toDF("a").repartition(1)
    val u = org.apache.spark.sql.functions.udf(shared)
    val out = in.select($"a", u($"a").as("ret")).select($"a", $"ret",
      u($"a").as("ret_2"))
    val got = out.as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 4L)))
    assert(UdfResidueCounters.calls.get() == 3)
  }

  test("deterministic UDFs are NOT auto-memoized: without a cache strategy " +
      "every row invokes the function (test_udf.py:513)") {
    UdfResidueCounters.calls.set(0)
    val f = Udfs.apply1 { (a: Long) =>
      UdfResidueCounters.calls.incrementAndGet(); a + 1
    }
    val in = Seq(1L, 2L, 2L, 3L, 1L).toDF("a").repartition(1)
    assert(in.select(f($"a")).as[Long].collect().sorted.toSeq ==
      Seq(2L, 2L, 3L, 3L, 4L))
    assert(UdfResidueCounters.calls.get() == 5)
  }
}
