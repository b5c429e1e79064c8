package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, TestGroupState}
import org.apache.spark.api.java.Optional

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{AsofEvent, AsofJoinState, AsofNearestState}

/** Property-style equivalence check for the three stream-stream asof
  * kernels: random event sequences are driven through the kernel functions
  * directly via Spark's `TestGroupState` harness — simulating the
  * micro-batch protocol (per-batch invocation, the one-batch watermark lag,
  * timeout firings when the watermark passes a registered timestamp, final
  * flush) — and every emission must match brute-force asof semantics
  * computed over the full event set. This covers orders of magnitude more
  * interleavings than the MemoryStream specs (which pin the end-to-end
  * wiring; this pins the state machine). */
class AsofKernelPropertySpec extends AnyFunSuite {

  type Ev = AsofEvent[String, String]
  type Out = (Long, Long, String, Option[String])

  private val DelayMs = 5L * 60 * 1000

  /** Run a kernel over `batches` with Spark's semantics: the watermark seen
    * by batch N is derived from batches < N; registered timeouts fire as
    * soon as the watermark passes them; a final flush advances the
    * watermark far past every event. */
  private def simulate[S](
      kernel: (Long, Iterator[Ev], GroupState[S]) => Iterator[Out],
      batches: Seq[Seq[Ev]]): Seq[Out] = {
    var state: Optional[S] = Optional.empty[S]()
    var wm = 0L
    var maxSeen = 0L
    var lastTimeout: Option[Long] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[Out]

    def invoke(evs: Seq[Ev], timedOut: Boolean): Unit = {
      val st = TestGroupState.create[S](state, GroupStateTimeout.EventTimeTimeout,
        1000L, Optional.of(wm), timedOut)
        .asInstanceOf[TestGroupState[S]]
      out ++= kernel(1L, evs.iterator, st)
      state =
        if (st.isRemoved || !st.exists) Optional.empty[S]()
        else Optional.of(st.get)
      // remember the registered timeout for the firing loop
      lastTimeout = if (st.isRemoved || !st.getTimeoutTimestampMs.isPresent) None
        else Some(st.getTimeoutTimestampMs.get)
    }

    def fireTimeouts(): Unit = {
      var guard = 0
      while (state.isPresent && lastTimeout.exists(_ <= wm) && guard < 1000) {
        invoke(Nil, timedOut = true)
        guard += 1
      }
      assert(guard < 1000, "timeout firing loop did not converge")
    }

    batches.foreach { b =>
      fireTimeouts() // timeouts due under the current watermark fire first
      invoke(b, timedOut = false)
      maxSeen = math.max(maxSeen, b.map(_.timeMs).max)
      wm = maxSeen - DelayMs // next batch sees this watermark
    }
    // flush: push the watermark past everything and drain timeouts
    wm = maxSeen + 100L * DelayMs
    fireTimeouts()
    // one empty non-timeout batch in case state held but no timeout was set
    if (state.isPresent) { invoke(Nil, timedOut = false); fireTimeouts() }
    out.toSeq
  }

  private def gen(seed: Long, n: Int): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    val times = rnd.shuffle((1 to 400).toList).take(n).map(_ * 60000L)
    times.map { t =>
      val isLeft = rnd.nextBoolean()
      AsofEvent[String, String](isLeft, t,
        if (isLeft) Some(s"L$t") else None, if (isLeft) None else Some(s"R$t"))
    }.sortBy(_.timeMs) // in-order delivery: nothing is ever late
  }

  private def split(evs: Seq[Ev], k: Int): Seq[Seq[Ev]] =
    evs.grouped(math.max(1, (evs.size + k - 1) / k)).toSeq

  test("buffer kernel: out-of-order delivery releases kept rows in event-time order") {
    (1L to 20L).foreach { seed =>
      val rnd = new scala.util.Random(seed + 3000)
      // OUT-OF-ORDER delivery (unlike the asof cases): some rows arrive
      // behind the watermark and must be dropped, never crash the kernel
      val times = rnd.shuffle((1 to 400).toList).take(30).map(_ * 60000L)
      val batches = times.grouped(8).toSeq
      var state: Optional[List[Long]] = Optional.empty()
      var lastTimeout: Option[Long] = None
      var wm = 0L
      var maxSeen = 0L
      val released = scala.collection.mutable.ArrayBuffer.empty[Long]
      val expectedKept = scala.collection.mutable.ArrayBuffer.empty[Long]
      def invoke(evs: Seq[Long], timedOut: Boolean): Unit = {
        val st = TestGroupState.create[List[Long]](state,
          GroupStateTimeout.EventTimeTimeout, 1000L, Optional.of(wm), timedOut)
          .asInstanceOf[TestGroupState[List[Long]]]
        released ++= StreamOps.bufferKernel[Long, Long](identity)(1L, evs.iterator, st)
        state = if (st.isRemoved || !st.exists) Optional.empty() else Optional.of(st.get)
        lastTimeout = if (st.isRemoved || !st.getTimeoutTimestampMs.isPresent) None
          else Some(st.getTimeoutTimestampMs.get)
      }
      def fire(): Unit = {
        var g = 0
        while (state.isPresent && lastTimeout.exists(_ <= wm) && g < 1000) {
          invoke(Nil, timedOut = true); g += 1
        }
      }
      batches.foreach { b =>
        fire()
        expectedKept ++= b.filter(_ > wm) // late-at-delivery rows are dropped
        invoke(b, timedOut = false)
        maxSeen = math.max(maxSeen, b.max)
        wm = maxSeen - DelayMs
      }
      wm = maxSeen + 100 * DelayMs
      fire()
      assert(released.toList == expectedKept.toList.sorted,
        s"seed=$seed: releases must be exactly the kept rows in event-time order")
    }
  }

  test("backward kernel == brute-force backward asof over 20 random sequences") {
    (1L to 20L).foreach { seed =>
      val evs = gen(seed, 30)
      val lefts = evs.filter(_.isLeft).map(e => e.timeMs -> e.left.get)
      val rights = evs.filterNot(_.isLeft).map(e => e.timeMs -> e.right.get)
      val got = simulate[AsofJoinState[String, String]](
        StreamOps.asofJoinKernel[Long, String, String], split(evs, 4))
        .map(o => (o._2, o._3, o._4)).toSet
      val expected = lefts.map { case (lt, lv) =>
        val c = rights.filter(_._1 <= lt)
        (lt, lv, if (c.isEmpty) None else Some(c.maxBy(_._1)._2))
      }.toSet
      assert(got == expected, s"seed=$seed")
    }
  }

  test("forward kernel == brute-force forward asof over 20 random sequences") {
    (1L to 20L).foreach { seed =>
      val evs = gen(seed + 1000, 30)
      val lefts = evs.filter(_.isLeft).map(e => e.timeMs -> e.left.get)
      val rights = evs.filterNot(_.isLeft).map(e => e.timeMs -> e.right.get)
      val got = simulate[AsofJoinState[String, String]](
        StreamOps.asofForwardKernel[Long, String, String], split(evs, 4))
        .map(o => (o._2, o._3, o._4)).toSet
      // forward never emits None: only lefts with some right >= t resolve
      val expected = lefts.flatMap { case (lt, lv) =>
        val c = rights.filter(_._1 >= lt)
        if (c.isEmpty) None else Some((lt, lv, Some(c.minBy(_._1)._2)))
      }.toSet
      assert(got == expected, s"seed=$seed")
    }
  }

  test("nearest kernel == brute-force nearest (ties forward) over 20 random sequences") {
    (1L to 20L).foreach { seed =>
      val evs = gen(seed + 2000, 30)
      val lefts = evs.filter(_.isLeft).map(e => e.timeMs -> e.left.get)
      val rights = evs.filterNot(_.isLeft).map(e => e.timeMs -> e.right.get)
      val got = simulate[AsofNearestState[String, String]](
        StreamOps.asofNearestKernel[Long, String, String], split(evs, 4))
        .map(o => (o._2, o._3, o._4)).toSet
      val expected = lefts.flatMap { case (lt, lv) =>
        if (rights.isEmpty) None
        else {
          val best = rights.minBy { case (rt, _) =>
            (math.abs(rt - lt), if (rt > lt) 0 else 1) }
          Some((lt, lv, Some(best._2)))
        }
      }.toSet
      assert(got == expected, s"seed=$seed")
    }
  }
}
