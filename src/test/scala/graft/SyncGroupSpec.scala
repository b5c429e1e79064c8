package graft

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.InputSynchronization

/** Input synchronization groups (reference io/_synchronization.py:59):
  * coordinator admission semantics (unit) and two deliberately skewed
  * replay sources proving neither runs ahead (streaming integration). */
class SyncGroupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("coordinator: window paces the fast member; a one-sided jump is held forever") {
    InputSynchronization.reset("unit1")
    val c = InputSynchronization.group("unit1", maxDifference = 10L)
    c.register("fast"); c.register("slow")
    // a member's first call reports its pending head and admits nothing
    // while a peer has reported nothing yet (one planning round)
    assert(c.admit("fast", Seq(0L, 5L, 12L, 18L)) == 0)
    // slow is bounded by fast's pending head (0): the lower head advances
    // first — the reference's lockstep bootstrap
    assert(c.admit("slow", Seq(1L, 2L)) == 0)
    // fast: bound = max(None, slow's pending 1) = 1 -> only 0 passes
    assert(c.admit("fast", Seq(0L, 5L, 12L, 18L)) == 1)
    // slow: bound = max(fast frontier 0 + 10, fast pending 5) = 10
    assert(c.admit("slow", Seq(1L, 2L)) == 2)
    // fast: bound = max(2 + 10, nothing pending) = 12
    assert(c.admit("fast", Seq(5L, 12L, 18L)) == 2)
    // slow advances toward fast's pending 18: bound max(12+10, 18) = 22
    assert(c.admit("slow", Seq(7L, 11L)) == 2)
    // slow at 11, nothing pending -> fast admits 18, 20; 25 out (bound 21)
    assert(c.admit("fast", Seq(18L, 20L, 25L)) == 2)
    // one-sided jump: slow's 100 exceeds everything fast will ever have
    // (fast pending tops out at 25) — held, like the reference holds it
    // (test_io.py plan [1]/[...,11,12]: 12 stays out forever)
    assert(c.admit("slow", Seq(100L)) == 0)
    assert(c.admit("fast", Seq(25L)) == 1)
    assert(c.admit("fast", Seq.empty) == 0) // fast drained
    assert(c.admit("slow", Seq(100L)) == 0) // bound 25+10: held forever
    assert(c.frontiers("slow").contains(11L))
  }

  test("coordinator: a group-wide data gap passes — pending heads anticipate it") {
    InputSynchronization.reset("gap")
    val c = InputSynchronization.group("gap", maxDifference = 10L)
    c.register("a"); c.register("b")
    assert(c.admit("a", Seq(0L)) == 0) // b unreported
    assert(c.admit("b", Seq(0L)) == 1) // a's pending head 0 -> bound 0
    assert(c.admit("a", Seq(0L)) == 1) // b frontier 0 -> bound 10
    // both feeds jump past 1000 together: each side first REPORTS its jump
    // (admitting nothing), then the lower head passes, then the higher
    assert(c.admit("a", Seq(1000L)) == 0) // b's term max(0+10, none) = 10
    assert(c.admit("b", Seq(1002L)) == 0) // a's term max(10, 1000) = 1000
    assert(c.admit("a", Seq(1000L)) == 1) // b's term max(10, 1002) = 1002
    assert(c.admit("b", Seq(1002L)) == 1) // a's term max(1010, none)
  }

  test("coordinator: priority member leads; lower priority never passes its frontier") {
    InputSynchronization.reset("unit2")
    val c = InputSynchronization.group("unit2", maxDifference = 100L)
    c.register("leader", priority = 1); c.register("follower", priority = 0)
    // follower cannot bootstrap before the leader reports/confirms
    assert(c.admit("follower", Seq(5L, 9L)) == 0)
    // the leader is also bounded by the follower's pending head (5): the
    // global threshold applies to everyone — its lead comes from the
    // deadlock raise below
    assert(c.admit("leader", Seq(0L, 7L)) == 1)
    // follower's 5 needs the leader CONFIRMED to 5 first: blocked
    assert(c.admit("follower", Seq(5L, 9L)) == 0)
    // nobody passes the plain threshold now -> the top-priority group's
    // smallest pending head (7) raises the bound: the leader advances
    // (reference synchronization.rs:629-661, proven by its [0,100]p1/[0,1]
    // plan where 100 passes only this way)
    assert(c.admit("leader", Seq(7L)) == 1)
    // follower may now read values <= leader frontier (7)
    assert(c.admit("follower", Seq(5L, 9L)) == 1)
    assert(c.admit("leader", Seq(30L)) == 1)
    assert(c.admit("follower", Seq(9L, 28L, 31L)) == 2)
  }

  test("coordinator: two leaders — the follower is gated on the SLOWEST leader's frontier") {
    // reference higher_prioritized_source_is_behind (synchronization.rs:
    // 403-420): blocked if ANY higher-priority member is behind — the gate
    // is the min over leaders, not the max
    InputSynchronization.reset("unit7")
    val c = InputSynchronization.group("unit7", maxDifference = 1000L)
    c.register("l1", priority = 1); c.register("l2", priority = 1)
    c.register("f", priority = 0)
    assert(c.admit("l1", Seq(100L)) == 0) // peers unreported
    assert(c.admit("l2", Seq(5L, 7L, 120L)) == 0) // f unreported
    assert(c.admit("f", Seq(50L)) == 0) // both leaders unconfirmed
    assert(c.admit("l2", Seq(5L, 7L, 120L)) == 2) // bound: f's pending 50
    // nobody passes the plain threshold (l1's 100 > min term 50; f's 50 is
    // leader-gated; l2's 120 > 50) -> top-priority raise to min(100, 120)
    assert(c.admit("l1", Seq(100L)) == 1)
    // THE min-gate assert: l1 confirmed 100 but l2 only 7 — under a
    // max-of-leaders gate f's 50 would pass; the reference blocks it
    assert(c.admit("f", Seq(50L)) == 0,
      "follower must be gated on the slowest leader")
    assert(c.admit("f", Seq(6L)) == 1) // within the slowest leader's 7
  }

  test("coordinator: idle member is excluded after idleMs and re-included on data") {
    InputSynchronization.reset("unit3")
    val c = InputSynchronization.group("unit3", maxDifference = 10L)
    // generous idle window: a tighter one (e.g. 50 ms) flakes when the
    // test thread is descheduled between admits under parallel-suite load
    c.register("a"); c.register("b", idleMs = Some(2000L))
    assert(c.admit("b", Seq(0L)) == 0) // a unreported
    assert(c.admit("a", Seq(1L, 2L)) == 0) // b's pending head 0 bounds
    assert(c.admit("b", Seq(0L)) == 1) // a's pending 1 -> bound 1
    assert(c.admit("a", Seq(1L, 2L)) == 2) // b frontier 0 -> bound 10
    // b at 0 (nothing pending) blocks a above 10
    assert(c.admit("a", Seq(11L, 50L)) == 0)
    Thread.sleep(2500) // b produces nothing for > idleMs -> excluded
    assert(c.admit("a", Seq(11L, 50L)) == 2, "idle member must not hold the group")
    // b returns with data -> re-included; 3 ≤ a's term max(50+10, none)
    assert(c.admit("b", Seq(3L)) == 1)
    // and a is constrained by b again: bound max(3+10, none) = 13
    assert(c.admit("a", Seq(60L)) == 0)
  }

  test("coordinator: drained member's frontier stays trusted across a peer restart") {
    InputSynchronization.reset("unit4")
    val c = InputSynchronization.group("unit4", maxDifference = 10L)
    c.register("d"); c.register("r")
    assert(c.admit("r", Seq(0L, 5L)) == 0) // d unreported
    assert(c.admit("d", Seq(0L, 8L, 12L)) == 1) // r's pending head 0 bounds
    assert(c.admit("r", Seq(0L, 5L)) == 2) // d's term max(0+10, pending 8)
    assert(c.admit("d", Seq(8L, 12L)) == 2) // r at 5 -> bound 15
    // d is drained: from here it only ever plans empty-handed
    assert(c.admit("d", Seq.empty) == 0)
    // r restarts fresh (no checkpoint): resetMember bumps the group epoch,
    // distrusting every frontier until its member proves liveness
    c.resetMember("r")
    // d is still LIVE (its stream plans every trigger) but has no pending
    // rows — the empty-handed admit alone must re-validate d's epoch so
    // its real frontier (12) keeps pacing the group
    assert(c.admit("d", Seq.empty) == 0)
    assert(c.admit("r", Seq(0L, 5L)) == 2) // d's 12 trusted -> cap 22
    // the regression: with d's frontier distrusted (MinValue), r would
    // admit 0 here forever (nothing within MinValue+maxDifference) — the
    // group stalls. Trusted, 12+10=22 admits the first two values.
    assert(c.admit("r", Seq(7L, 12L, 30L)) == 2,
      "group stalled: drained peer's frontier was distrusted after restart")
  }

  test("coordinator: superseded and deregistered leases neither admit nor pace peers") {
    InputSynchronization.reset("unit5")
    val c = InputSynchronization.group("unit5", maxDifference = 10L)
    val l1a = c.register("a"); val lb = c.register("b")
    assert(c.admit("a", Seq(0L, 8L), l1a) == 0) // b unreported
    assert(c.admit("b", Seq(0L, 5L), lb) == 1) // a's pending head 0 bounds
    assert(c.admit("a", Seq(0L, 8L), l1a) == 2) // b's term max(0+10, 5)
    assert(c.admit("b", Seq(5L), lb) == 1) // a's term max(8+10, none)
    // a restarts in place: the new registration supersedes l1a — the old
    // stream's admits are ignored outright (no frontier advance, no
    // liveness proof)
    val l2a = c.register("a")
    assert(c.admit("a", Seq(60L), l1a) == 0, "zombie lease must admit nothing")
    assert(c.frontiers("a").contains(8L), "zombie admit must not move the frontier")
    // orderly stop of a's current stream: deregister distrusts its final
    // frontier — b must NOT keep pacing against it (stall, not run-ahead)
    c.deregister("a", l2a)
    assert(c.admit("b", Seq(7L), lb) == 0,
      "stopped member's stale frontier must not pace peers")
    // a's successor registers and proves liveness (its first planning call,
    // even one that admits nothing) — b unstalls against the real state
    val l3a = c.register("a")
    assert(c.admit("a", Seq(55L), l3a) == 0) // b's term max(5+10, 7) = 15
    assert(c.admit("b", Seq(7L), lb) == 1, // a's term max(8+10, 55) = 55
      "peer must unstall once the successor proves liveness")
  }

  test("coordinator: re-registration adopts the new run's priority") {
    InputSynchronization.reset("unit6")
    val c = InputSynchronization.group("unit6", maxDifference = 100L)
    c.register("m") // first run: priority 0
    c.register("f")
    // m restarts with priority 1: the JVM-global coordinator must adopt it —
    // f can then no longer pass m's confirmed frontier (leader-reads-first)
    c.register("m", priority = 1)
    assert(c.admit("f", Seq(5L)) == 0) // m unreported
    assert(c.admit("m", Seq(0L, 7L)) == 1) // f's pending head 5 bounds
    // THE discriminating assert: with adopted priority 1, f's 5 is gated
    // on m confirming 5 (m is at 0) -> 0; were adoption broken (m still
    // p0), f's bound would be m's term max(0+100, 7) and 5 would pass
    assert(c.admit("f", Seq(5L)) == 0, "re-registered priority must apply")
    assert(c.admit("m", Seq(7L)) == 1) // via the top-priority deadlock raise
    assert(c.admit("f", Seq(5L)) == 1) // leader confirmed to 7
    assert(c.admit("f", Seq(50L)) == 0) // still gated at the leader's 7
  }

  test("coordinator: a seeded recovery frontier unblocks peers in a fresh process") {
    // cross-process checkpoint recovery: a fresh JVM's coordinator starts
    // empty, and a member that recovers DRAINED only ever admits empty
    // values — without the seed its term is undecidable forever and every
    // peer admits nothing (r15 ADVICE deadlock)
    InputSynchronization.reset("seed1")
    val c = InputSynchronization.group("seed1", maxDifference = 10L)
    c.register("drained"); c.register("live")
    assert(c.admit("drained", Seq.empty) == 0)
    assert(c.admit("live", Seq(5L, 20L, 30L)) == 0,
      "an unseeded drained member must block (term undecidable)")
    // the recovered stream seeds its checkpoint-confirmed frontier
    c.seed("drained", 12L)
    assert(c.admit("drained", Seq.empty) == 0) // still drained — but paces
    assert(c.admit("live", Seq(5L, 20L, 30L)) == 2) // bound 12 + 10 = 22
    assert(c.admit("live", Seq(30L)) == 0) // past the window: held
    // seeding is monotone: a stale lower seed must not drag the frontier back
    c.seed("drained", 3L)
    assert(c.frontiers("drained").contains(12L))
  }

  test("coordinator: a multi-row unit's HEAD paces peers; its MAX gates its own admission") {
    // spool-file units report (values = per-file max, heads = per-file
    // min): peers must anticipate the member's next single value (the
    // head), not the file's far edge (r15 ADVICE — with max-based heads a
    // peer could run past the member's confirmed frontier by
    // maxDifference plus the file's internal span)
    InputSynchronization.reset("heads1")
    val c = InputSynchronization.group("heads1", maxDifference = 10L)
    c.register("spool"); c.register("done"); c.register("probe")
    c.seed("done", 55L) // recovered at 55, drained: term caps the group at 65
    assert(c.admit("probe", Seq(58L, 62L)) == 0) // spool unreported
    // spool's pending file spans [60, 100]: whole-file admission needs
    // 100 ≤ bound, and the drained member caps the bound at 65 — held
    // (the reference would walk the file partially; whole-file
    // granularity holds it, the documented tradeoff)
    assert(c.admit("spool", Seq(100L), heads = Some(Seq(60L))) == 0)
    // THE discriminating assert: probe's window is spool's HEAD (60), so
    // 58 passes and 62 waits for spool to confirm ≥ 52. Under max-based
    // heads spool's term would be 100, the bound min(100, 65) = 65, and
    // 62 would run 2 past spool's actual next row
    assert(c.admit("probe", Seq(58L, 62L)) == 1)
  }

  test("coordinator: deadlock raise admits the laggard's whole unit (head-selected)") {
    // two spool members with file-sized units and maxDifference smaller
    // than a file span: progress requires raising to the WHOLE next unit
    // of the member with the smallest head (for single-value units this
    // degenerates to the reference's next_proposed_value raise)
    InputSynchronization.reset("heads2")
    val c = InputSynchronization.group("heads2", maxDifference = 5L)
    c.register("a"); c.register("b")
    assert(c.admit("a", Seq(9L, 19L), heads = Some(Seq(0L, 10L))) == 0) // b unreported
    // b: both files out of the naive window (a's head 0) — the raise
    // targets a's first unit (head 0, max 9), so b's [0..9] file passes
    assert(c.admit("b", Seq(9L, 19L), heads = Some(Seq(0L, 10L))) == 1)
    // a: bound = max(b frontier 9 + 5, b head 10) = 14 — its [0..9]
    // file passes plainly (no raise: a's own unit is admissible)
    assert(c.admit("a", Seq(9L, 19L), heads = Some(Seq(0L, 10L))) == 1)
    // a's second file [10..19]: 19 > 14, b's symmetric file equally stuck
    // — the raise targets the smallest-head member's whole unit (19)
    assert(c.admit("a", Seq(19L), heads = Some(Seq(10L))) == 1)
    // b follows within the confirmed window: bound = max(19 + 5, none)
    assert(c.admit("b", Seq(19L), heads = Some(Seq(10L))) == 1)
    assert(c.violationCount == 0)
  }

  test("two skewed replay sources: neither runs ahead of the other by more than maxDifference") {
    InputSynchronization.reset("stream1")
    val dir = java.nio.file.Files.createTempDirectory("graft-sync").toString
    (0L until 60L).map(t => (t, s"a$t")).toDF("t", "payload")
      .write.mode("overwrite").parquet(s"$dir/a")
    (0L until 60L).map(t => (t, s"b$t")).toDF("t", "payload")
      .write.mode("overwrite").parquet(s"$dir/b")

    def start(member: String, rowsPerBatch: Int) = spark.readStream
      .format("graft.sources.SyncedReplaySource")
      .option("path", s"$dir/$member")
      .option("syncCol", "t")
      .option("rowsPerBatch", rowsPerBatch.toString)
      .option("group", "stream1")
      .option("member", member)
      .option("maxDifference", "10")
      // declared membership: the first-constructed member must not drain
      // unsynchronized before its peer's stream initializes
      .option("groupSize", "2")
      .load()
      .writeStream
      .format("noop")
      .trigger(Trigger.ProcessingTime(25))
      .start()

    // a reads 30 rows/batch (would drain in 2 batches), b only 5 — without
    // the group, a finishes while b is at value ~10
    val qa = start("a", 30)
    val qb = start("b", 5)
    try {
      val deadline = System.currentTimeMillis() + 60000
      val c = InputSynchronization.group("stream1", 10L)
      while (System.currentTimeMillis() < deadline &&
        !(c.frontiers.get("a").flatten.contains(59L) &&
          c.frontiers.get("b").flatten.contains(59L))) Thread.sleep(100)
      val fr = c.frontiers
      assert(fr("a").contains(59L) && fr("b").contains(59L),
        s"both sources must drain fully, got $fr")
      // the invariant: every windowed admission stayed within maxDifference
      // of the slowest peer's contribution at decision time
      val entries = c.audit.filter(_.minOther.isDefined)
      assert(entries.nonEmpty)
      val offenders = entries.filter(e => e.frontier > e.minOther.get)
      assert(offenders.isEmpty, s"frontier ran ahead: $offenders")
      // the coordinator's own lifetime tripwire agrees with the audit scan
      // (the counter is what long-running rungs assert after audit trims)
      assert(c.violationCount == 0L)
      // and the fast source genuinely interleaved: it cannot have drained
      // before the slow one started (its non-bootstrap admissions were
      // throttled to the slow frontier)
      val aThrottled = c.audit.filter(e => e.member == "a" && e.minOther.isDefined)
      assert(aThrottled.size >= 2,
        s"fast source must have been paced across batches; audit=${c.audit}")
    } finally { qa.stop(); qb.stop() }
  }

  test("two skewed SPOOL sources: non-collected member shape holds the same invariant") {
    // the r13 watch item: SyncedReplaySource holds the full sync array
    // driver-resident. The spool-backed member computes per-file frontiers
    // incrementally and ships FILE PATHS to executors — no row data on the
    // driver — and must hold the identical neither-runs-ahead invariant.
    InputSynchronization.reset("spool1")
    val dir = java.nio.file.Files.createTempDirectory("graft-spool").toString
    for (m <- Seq("a", "b")) {
      val d = java.nio.file.Paths.get(dir, m)
      java.nio.file.Files.createDirectories(d)
      for (k <- 0 until 20) { // file k holds sync values 3k..3k+2, ascending
        val lines = (0 until 3).map(i => s"""{"t":${3 * k + i},"payload":"$m${3 * k + i}"}""")
        java.nio.file.Files.write(d.resolve(f"f$k%05d.json"),
          (lines.mkString("\n") + "\n").getBytes("UTF-8"))
      }
    }
    def start(member: String, filesPerBatch: Int) = spark.readStream
      .format("graft.sources.SyncedSpoolSource")
      .option("path", s"$dir/$member")
      .option("syncCol", "t")
      .option("filesPerBatch", filesPerBatch.toString)
      .option("group", "spool1")
      .option("member", member)
      .option("maxDifference", "10")
      .option("groupSize", "2")
      .load()
      .select(from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL("t LONG, payload STRING")).as("r"))
      .select(col("r.t").as("t"), col("r.payload").as("payload"))
      .writeStream
      .format("memory")
      .queryName(s"spool_$member")
      .trigger(Trigger.ProcessingTime(25))
      .start()
    // a reads 8 files/batch (would drain in 3 triggers), b only 1
    val qa = start("a", 8)
    val qb = start("b", 1)
    try {
      val deadline = System.currentTimeMillis() + 60000
      val c = InputSynchronization.group("spool1", 10L)
      while (System.currentTimeMillis() < deadline &&
        !(c.frontiers.get("a").flatten.contains(59L) &&
          c.frontiers.get("b").flatten.contains(59L))) Thread.sleep(100)
      assert(c.frontiers("a").contains(59L) && c.frontiers("b").contains(59L),
        s"both spools must drain fully, got ${c.frontiers}")
      val entries = c.audit.filter(_.minOther.isDefined)
      assert(entries.nonEmpty)
      val offenders = entries.filter(e => e.frontier > e.minOther.get)
      assert(offenders.isEmpty, s"frontier ran ahead: $offenders")
      assert(c.violationCount == 0L)
      val aThrottled = c.audit.filter(e => e.member == "a" && e.minOther.isDefined)
      assert(aThrottled.size >= 2,
        s"fast spool must have been paced across batches; audit=${c.audit}")
      // and the rows really flowed through the executor-side readers
      val deadline2 = System.currentTimeMillis() + 20000
      def rows(m: String) = spark.table(s"spool_$m").count()
      while (System.currentTimeMillis() < deadline2 &&
        (rows("a") < 60 || rows("b") < 60)) Thread.sleep(100)
      assert(rows("a") == 60 && rows("b") == 60)
      assert(spark.table("spool_a").where(col("payload") === "a59").count() == 1)
    } finally { qa.stop(); qb.stop() }
  }

  test("spool compaction: committed files move to _processed/; ranks survive recovery") {
    // r15 item 4: the per-trigger listStatus was the one O(files) planning
    // term; with compact=true each committed file moves to _processed/, so
    // steady-state listing is O(unprocessed). Ranks must keep resolving
    // through the moved prefix — including checkpoint recovery over a
    // FULLY compacted spool followed by a new arrival.
    InputSynchronization.reset("spoolc")
    val dir = java.nio.file.Files.createTempDirectory("graft-spoolc").toString
    def writeFile(m: String, k: Int): Unit = {
      val d = java.nio.file.Paths.get(dir, m)
      java.nio.file.Files.createDirectories(d)
      val lines = (0 until 3).map(i => s"""{"t":${3 * k + i}}""")
      java.nio.file.Files.write(d.resolve(f"f$k%05d.json"),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    }
    for (m <- Seq("a", "b"); k <- 0 until 10) writeFile(m, k)
    val ck = java.nio.file.Files.createTempDirectory("graft-spoolc-ck").toString
    def start(member: String) = spark.readStream
      .format("graft.sources.SyncedSpoolSource")
      .option("path", s"$dir/$member").option("syncCol", "t")
      .option("filesPerBatch", "2").option("group", "spoolc")
      .option("member", member).option("maxDifference", "10")
      .option("groupSize", "2").option("compact", "true")
      .load()
      .writeStream.format("noop")
      .option("checkpointLocation", s"$ck/$member")
      .trigger(Trigger.ProcessingTime(25)).start()
    def visible(m: String) = new java.io.File(s"$dir/$m").listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    def processed(m: String) = {
      val d = new java.io.File(s"$dir/$m/_processed")
      if (d.exists) d.listFiles().count(_.isFile) else 0
    }
    val c = InputSynchronization.group("spoolc", 10L)
    val qa = start("a"); val qb = start("b")
    try {
      var deadline = System.currentTimeMillis() + 60000
      while (System.currentTimeMillis() < deadline &&
        !(c.frontiers.get("a").flatten.contains(29L) &&
          c.frontiers.get("b").flatten.contains(29L))) Thread.sleep(50)
      assert(c.frontiers("a").contains(29L) && c.frontiers("b").contains(29L),
        s"both spools must drain, got ${c.frontiers}")
      // compaction follows the batch commits — Spark invokes commit(N)
      // only once a LATER batch runs, so the final batch's files (≤
      // filesPerBatch of them) legitimately stay in the main dir until
      // the next arrival: steady-state listing is O(unprocessed + 1 batch)
      deadline = System.currentTimeMillis() + 20000
      while (System.currentTimeMillis() < deadline &&
        (visible("a") > 2 || visible("b") > 2)) Thread.sleep(50)
      for (m <- Seq("a", "b")) {
        assert(visible(m) <= 2 && visible(m) + processed(m) == 10,
          s"$m main=${visible(m)} processed=${processed(m)}")
        assert(processed(m) >= 8, s"$m compacted only ${processed(m)}")
      }
    } finally { qa.stop(); qb.stop() }
    // recovery over the fully-compacted spool: ranks resolve through
    // _processed, the recovered frontier seeds the coordinator, and a NEW
    // file is admitted on top
    for (m <- Seq("a", "b")) writeFile(m, 10)
    val qa2 = start("a"); val qb2 = start("b")
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (System.currentTimeMillis() < deadline &&
        !(c.frontiers.get("a").flatten.contains(32L) &&
          c.frontiers.get("b").flatten.contains(32L))) Thread.sleep(50)
      assert(c.frontiers("a").contains(32L) && c.frontiers("b").contains(32L),
        s"recovered spools must admit the new file: ${c.frontiers}")
      assert(c.violationCount == 0L)
    } finally { qa2.stop(); qb2.stop() }
    // FRESH query (new checkpoint) over the compacted spool: the global
    // rank view must serve the moved prefix from _processed/ for
    // reprocessing instead of silently skipping it (r15 review finding)
    val ck2 = java.nio.file.Files.createTempDirectory("graft-spoolc-ck2").toString
    def startFresh(member: String) = spark.readStream
      .format("graft.sources.SyncedSpoolSource")
      .option("path", s"$dir/$member").option("syncCol", "t")
      .option("filesPerBatch", "4").option("group", "spoolc")
      .option("member", member).option("maxDifference", "10")
      .option("groupSize", "2").option("compact", "false")
      .load()
      .writeStream.format("memory").queryName(s"spoolc_$member")
      .option("checkpointLocation", s"$ck2/$member")
      .trigger(Trigger.ProcessingTime(25)).start()
    val qa3 = startFresh("a"); val qb3 = startFresh("b")
    try {
      val deadline = System.currentTimeMillis() + 60000
      def rows(m: String) = spark.table(s"spoolc_$m").count()
      while (System.currentTimeMillis() < deadline &&
        (rows("a") < 33 || rows("b") < 33)) Thread.sleep(50)
      assert(rows("a") == 33 && rows("b") == 33,
        s"fresh replay must reprocess the compacted prefix: a=${rows("a")} b=${rows("b")}")
    } finally { qa3.stop(); qb3.stop() }
  }

  test("spool that violates sync order fails loudly instead of slipping rows past the group") {
    // names monotone but file 2's sync values UNDERCUT file 1's — the
    // "arrival order is sync order" contract is broken; the source must
    // abort, not admit rows the coordinator never paced
    InputSynchronization.reset("spoolbad")
    val dir = java.nio.file.Files.createTempDirectory("graft-spool-bad").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f00000.json"),
      "{\"t\":100}\n".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f00001.json"),
      "{\"t\":50}\n".getBytes("UTF-8"))
    val q = spark.readStream
      .format("graft.sources.SyncedSpoolSource")
      .option("path", dir).option("syncCol", "t")
      .option("filesPerBatch", "2")
      .option("group", "spoolbad").option("member", "solo")
      .option("maxDifference", "10") // groupSize omitted: solo demo member
      .load()
      .writeStream.format("memory").queryName("spool_bad")
      .trigger(Trigger.ProcessingTime(25)).start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("sync-order contract") ||
        Option(e.getCause).exists(_.getMessage.contains("sync-order contract")),
        s"expected the sync-order require, got: ${e.getMessage}")
    } finally q.stop()
  }

  test("spool file with an unparseable sync row fails loudly instead of understating the frontier") {
    // one corrupt line among parseable ones: max() over the good rows would
    // silently understate the file's frontier while the raw corrupt line
    // still flows downstream unpaced — the source must abort instead
    InputSynchronization.reset("spoolcorrupt")
    val dir = java.nio.file.Files.createTempDirectory("graft-spool-corrupt").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f00000.json"),
      "{\"t\":0}\n{\"t\":120}\nnot-json-at-all\n".getBytes("UTF-8"))
    val q = spark.readStream
      .format("graft.sources.SyncedSpoolSource")
      .option("path", dir).option("syncCol", "t")
      .option("filesPerBatch", "1")
      .option("group", "spoolcorrupt").option("member", "solo")
      .option("maxDifference", "10") // groupSize omitted: solo demo member
      .load()
      .writeStream.format("memory").queryName("spool_corrupt")
      .trigger(Trigger.ProcessingTime(25)).start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def hit(m: String) = m != null && m.contains("without a parseable")
      assert(hit(e.getMessage) || Option(e.getCause).exists(c => hit(c.getMessage)),
        s"expected the null-sync-row require, got: ${e.getMessage}")
    } finally q.stop()
  }

  /** Replays a reference test plan at the coordinator level: each member's
    * units (file-per-row in the reference fixture; a multi-row file is
    * modeled by its frontier, since spool admission is whole-file) are
    * offered head-first in arrival order; rounds continue until two full
    * rounds admit nothing (reports only change on admission, so that is
    * the fixed point). Returns what each member admitted, in order. */
  private def replayPlan(name: String, maxDiff: Long,
      feeds: Seq[(String, Int, List[Long])]): Map[String, List[Long]] = {
    InputSynchronization.reset(name)
    val c = InputSynchronization.group(name, maxDiff)
    feeds.foreach { case (m, p, _) => c.register(m, priority = p) }
    val pending = scala.collection.mutable.Map(
      feeds.map { case (m, _, vs) => m -> scala.collection.mutable.Queue(vs: _*) }: _*)
    val admitted = scala.collection.mutable.Map(
      feeds.map { case (m, _, _) => m -> List.newBuilder[Long] }: _*)
    var idleRounds = 0
    while (idleRounds < 2) {
      var any = false
      for ((m, _, _) <- feeds) {
        val q = pending(m)
        if (c.admit(m, q.headOption.toSeq) > 0) { admitted(m) += q.dequeue(); any = true }
      }
      idleRounds = if (any) 0 else idleRounds + 1
    }
    admitted.map { case (m, b) => m -> b.result() }.toMap
  }

  test("reference plans (test_io.py test_synchronization_group) replay bit-exactly") {
    // plan: s1=[1,2,3,10], s2=[1,2,5,30] -> 30 held (expected_entries 7)
    assert(replayPlan("planA", 10, Seq(("s1", 0, List(1L, 2, 3, 10)), ("s2", 0, List(1L, 2, 5, 30))))
      == Map("s1" -> List(1L, 2, 3, 10), "s2" -> List(1L, 2, 5)))
    // plan: s1=[1], s2=[1,2,3,11,12] -> 12 held by the drained peer (5)
    assert(replayPlan("planB", 10, Seq(("s1", 0, List(1L)), ("s2", 0, List(1L, 2, 3, 11, 12))))
      == Map("s1" -> List(1L), "s2" -> List(1L, 2, 3, 11)))
    // plan: s1=[1,12], s2=[1,12] -> a group-wide jump passes on both (4)
    assert(replayPlan("planC", 10, Seq(("s1", 0, List(1L, 12)), ("s2", 0, List(1L, 12))))
      == Map("s1" -> List(1L, 12), "s2" -> List(1L, 12)))
    // plan: s1=[1,2,3,4,5], s2=[1,15] -> all pass once s1 reaches 5 (7)
    assert(replayPlan("planD", 10, Seq(("s1", 0, List(1L, 2, 3, 4, 5)), ("s2", 0, List(1L, 15))))
      == Map("s1" -> List(1L, 2, 3, 4, 5), "s2" -> List(1L, 15)))
    // plan: s1=[50,10,100] (out of order — max-frontier admission),
    // s2=[10,1000] -> 1000 held forever (4). s1's 50 passes because s2's
    // PENDING 1000 anticipates it — the behavior the catch-up-free window
    // rule exists for
    assert(replayPlan("planE", 10, Seq(("s1", 0, List(50L, 10, 100)), ("s2", 0, List(10L, 1000))))
      == Map("s1" -> List(50L, 10, 100), "s2" -> List(10L)))
    // priority plan: s1=[1,2]@p1, s2=[1..7] -> s2 capped at the leader's
    // read max (4)
    assert(replayPlan("planF", 10, Seq(("s1", 1, List(1L, 2)), ("s2", 0, List(1L, 2, 3, 4, 5, 6, 7))))
      == Map("s1" -> List(1L, 2), "s2" -> List(1L, 2)))
    // priority plan: s1=[0,100]@p1, s2=[0,1] -> the leader is never
    // window-capped by the follower; everything passes (4)
    assert(replayPlan("planG", 10, Seq(("s1", 1, List(0L, 100)), ("s2", 0, List(0L, 1))))
      == Map("s1" -> List(0L, 100), "s2" -> List(0L, 1)))
    // equal priority: s1=[0,100], s2=[0,1] -> 100 held forever (3)
    assert(replayPlan("planH", 10, Seq(("s1", 0, List(0L, 100)), ("s2", 0, List(0L, 1))))
      == Map("s1" -> List(0L), "s2" -> List(0L, 1)))
  }

  test("reference atomicity plans: a straddling file is held whole (test_io.py:4164)") {
    // file units modeled by their frontier (whole-file admission): s1's one
    // file holds k=1 and k=20 -> unit 20; maxDifference 10
    // plan 1: s2=[1] only -> s1's file NEVER passes (expected_entries 1)
    assert(replayPlan("atom1", 10, Seq(("s1", 0, List(20L)), ("s2", 0, List(1L))))
      == Map("s1" -> Nil, "s2" -> List(1L)))
    // plan 2: s2 gets a second file [15] -> everything passes (4 rows):
    // s2's 15 rides s1's pending 20; s1's file then fits under 15+10
    assert(replayPlan("atom2", 10, Seq(("s1", 0, List(20L)), ("s2", 0, List(1L, 15))))
      == Map("s1" -> List(20L), "s2" -> List(1L, 15)))
  }

  test("registration rejects a group of fewer than 2 members (reference test_io.py:3841)") {
    InputSynchronization.reset("tiny")
    val e = intercept[IllegalArgumentException] {
      InputSynchronization.group("tiny", 10L).expectGroupSize(1)
    }
    assert(e.getMessage.contains("at least 2 members"))
  }

  test("non-numeric sync column fails loudly instead of zeroing frontiers (reference test_io.py:3849)") {
    // a string syncCol casts to null; without the guard Row.getLong reads 0
    // silently and admission gating is disabled with no symptom
    InputSynchronization.reset("strsync")
    val dir = java.nio.file.Files.createTempDirectory("graft-sync-str").toString
    Seq(("not-a-number", 1), ("also-not", 2)).toDF("t", "v")
      .write.mode("overwrite").parquet(dir)
    val q = spark.readStream
      .format("graft.sources.SyncedReplaySource")
      .option("path", dir).option("syncCol", "t")
      .option("rowsPerBatch", "10")
      .option("group", "strsync").option("member", "solo")
      .option("maxDifference", "10")
      .load()
      .writeStream.format("memory").queryName("str_sync")
      .trigger(Trigger.ProcessingTime(25)).start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def hit(m: String) = m != null && m.contains("do not cast to long")
      assert(hit(e.getMessage) || Option(e.getCause).exists(c => hit(c.getMessage)),
        s"expected the non-numeric sync-column require, got: ${e.getMessage}")
    } finally q.stop()
  }

  test("alignedCut: batch analog admits exactly min-frontier + maxDifference") {
    val a = Seq((0L, "x"), (5L, "x"), (20L, "x")).toDF("t", "v") // max 20
    val b = Seq((1L, "y"), (8L, "y"), (12L, "y"), (40L, "y")).toDF("t", "v") // max 40
    // F = min(20, 40) = 20; maxDiff 5 -> keep t <= 25
    val out = InputSynchronization.alignedCut(Seq("a" -> a, "b" -> b), "t", 5L)
      .select("source", "t").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 0L), ("a", 5L), ("a", 20L),
      ("b", 1L), ("b", 8L), ("b", 12L)))
  }
}
