package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util
import scala.collection.mutable

/** Input synchronization groups — reference
  * `python/pathway/io/_synchronization.py:59`
  * `register_input_synchronization_group(*columns, max_difference, name)`:
  * align multiple INPUT sources on a shared (Long-comparable) column so
  * that no source's read frontier runs ahead of the slowest group member
  * by more than `max_difference`. Per-member `priority` (a member is
  * blocked while ANY strictly-higher-priority member has not confirmed up
  * to the candidate — the gate is the SLOWEST leader's confirmed
  * frontier; reference `higher_prioritized_source_is_behind`,
  * synchronization.rs:403-420 — the Python docstring's "highest value
  * already read" reads like a max but the engine code is a
  * blocked-if-any-behind loop) and
  * `idle_duration` (a member with no pending data for longer than its
  * idle duration is temporarily excluded from the group,
  * `_synchronization.py:38-44`) follow the reference contract.
  *
  * Spark shape: admission control in a DataSource V2 MicroBatchStream.
  * Each member source consults a JVM-shared [[InputSynchronization.Coordinator]]
  * from `latestOffset(start, limit)` — the planning hook Spark gives a
  * source to decide how far its offset may advance this micro-batch — and
  * admits only rows whose sync value passes the group rule (see [[
  * Coordinator.admit]] for the rule, derived from and replayed against
  * the reference's own test plans; windows anticipate peers' PENDING
  * units, so a group-wide data gap passes while a one-sided jump is held
  * — exactly the reference's observable behavior). Like the reference, the
  * coordinator is single-process state — on a multi-executor cluster the
  * DRIVER runs all `latestOffset` planning, so the same object
  * coordinates every source of the session (the reference notes the same
  * single-process limitation for its implementation).
  */
object InputSynchronization {

  /** Per-member admission bookkeeping. `frontier` = highest sync value
    * admitted; `lastData` = last nanoTime the member had pending rows
    * (drives idle exclusion); `epoch` = the group epoch this member last
    * proved liveness in — a frontier from an older epoch belongs to a
    * previous query run and must not be trusted (see resetMember). */
  private final class MemberState(var priority: Int, var idleMs: Option[Long]) {
    var frontier: Option[Long] = None
    /** Sync value of the member's next still-PENDING (unadmitted) unit as
      * of its last admit call; None once drained. Peers' admission windows
      * anticipate it (see [[Coordinator.admit]]): a member that has read
      * nothing but has a unit pending at v lets peers advance to
      * v + maxDifference — exactly how the reference lets a source read
      * while its peer's first (large-valued) unit is still held
      * (test_io.py test_synchronization_group plans). This is the
      * reference's `next_proposed_value` — the next SINGLE value the
      * member would send (for a multi-row unit like a spool file, the
      * unit's MIN, reported via [[Coordinator.admit]]'s `heads`). */
    var pendingHead: Option[Long] = None
    /** ADMISSION value of the member's next pending unit — the value the
      * whole unit must pass the bound with (= the unit's MAX; equals
      * [[pendingHead]] for single-value units). Drives the deadlock
      * raise: raising only to a unit's head (min) could not actually
      * admit a multi-row unit, so the group would stay stuck. */
    var pendingUnit: Option[Long] = None
    var lastData: Long = System.nanoTime()
    var epoch: Long = 0L
    /** Lease of the CURRENT stream instance for this member: re-registering
      * (a new run's stream construction) supersedes older instances, whose
      * admit calls are then ignored — a not-yet-stopped previous-run stream
      * planning one last empty trigger must not re-validate its stale
      * end-of-run frontier after a peer's resetMember distrusted it. */
    var lease: Long = 0L
  }

  /** One admission decision, for specs/monitoring: the member, its new
    * frontier, and the EFFECTIVE BOUND the admission was checked against
    * (min of the group threshold and the caller's higher-priority gate;
    * None when the member was uncapped — no active peers). Every admission
    * satisfies frontier ≤ minOther by construction. */
  final case class Admission(member: String, frontier: Long,
      minOther: Option[Long])

  final class Coordinator(val name: String, val maxDifference: Long) {
    private val members = mutable.LinkedHashMap.empty[String, MemberState]
    private val auditLog = mutable.ArrayBuffer.empty[Admission]
    private var expectedSize = 0
    private var groupEpoch = 0L
    /** A frontier is trusted only from a member current in this epoch. */
    private def trusted(s: MemberState): Option[Long] =
      if (s.epoch == groupEpoch) s.frontier else None

    private var leaseCounter = 0L
    /** Register (or re-register) a member's stream instance; returns the
      * instance's lease token to pass to [[admit]]. Each registration
      * supersedes the member's previous stream: a zombie instance from an
      * earlier run holding an older lease gets `admit == 0` with no state
      * mutation (see [[MemberState.lease]]). Re-registering also adopts the
      * NEW run's priority/idleMs — the JVM-global coordinator must not pin
      * a member to its first run's options forever. Superseding a lease
      * that was never [[deregister]]ed is logged: it is normal after a
      * crash (the dead stream never reached stop()) but means a silent
      * zero-admission hang if the old instance is in fact still running
      * (two live streams must not share a member name). */
    def register(member: String, priority: Int = 0,
        idleMs: Option[Long] = None): Long = synchronized {
      if (!members.contains(member))
        members(member) = new MemberState(priority, idleMs)
      val st = members(member)
      st.priority = priority
      st.idleMs = idleMs
      if (st.lease > 0)
        InputSynchronization.log.warn(
          s"sync group '$name': superseding live lease ${st.lease} of member " +
            s"'$member' (previous stream crashed, or two streams share the name)")
      leaseCounter += 1
      st.lease = leaseCounter
      leaseCounter
    }

    /** Invalidate a stream instance's lease at query stop: a stopped
      * stream must neither prove liveness nor keep pacing peers with its
      * final frontier — the frontier is distrusted until the member's
      * successor (checkpoint recovery or a fresh start) registers and
      * proves liveness with its first admit. Together with the lease guard
      * this closes the zombie window for every ORDERLY stop-then-restart;
      * only a stream that keeps planning concurrently with its replacement
      * run (misuse: two live runs at once) can still slip one stale-epoch
      * refresh in before its stop. No-op for superseded leases. */
    def deregister(member: String, lease: Long): Unit = synchronized {
      members.get(member).foreach { st =>
        if (st.lease == lease) {
          st.lease = 0L
          st.epoch = groupEpoch - 1
        }
      }
    }

    /** Declare how many members the group will have (the reference
      * registers all group columns atomically; V2 sources construct
      * asynchronously, so a declared size keeps the first-started member
      * from draining unsynchronized before its peers exist). admit()
      * returns 0 until the group is fully assembled. */
    def expectGroupSize(n: Int): Unit = synchronized {
      // mirrors the reference's registration check (test_io.py:3841 "At
      // least two columns must participate in a connector group"): a
      // 1-member group would trivially never pace and is a user error
      require(n >= 2,
        s"a synchronization group needs at least 2 members, got groupSize=$n")
      expectedSize = math.max(expectedSize, n)
    }

    /** Reset one member's admission state — called on a FRESH query start
      * (no checkpoint): the JVM-global coordinator otherwise carries the
      * previous run's high frontiers and admission gating would be
      * silently disabled for the whole replay. Bumps the group EPOCH: every
      * OTHER member's frontier is distrusted until that member proves
      * liveness with its next admit (a stale end-of-run frontier from a
      * previous query would otherwise let the restarting member pace only
      * against itself; a live peer re-validates within one trigger). */
    def resetMember(member: String): Unit = synchronized {
      groupEpoch += 1
      members.get(member).foreach { st =>
        st.frontier = None
        st.pendingHead = None
        st.pendingUnit = None
        st.epoch = groupEpoch
        st.lastData = System.nanoTime()
      }
    }

    /** Seed a member's CONFIRMED frontier recovered from a checkpoint —
      * called on checkpoint recovery in a FRESH process, where the
      * JVM-global coordinator starts empty. Without the seed, a member
      * that recovers drained (or over a quiet spool) only ever calls
      * [[admit]] with empty `values`: its frontier stays None, its term
      * is undecidable, and every peer admits nothing forever — a
      * cross-process-restart deadlock the reference never hits because
      * its `last_reported_value` lives in one continuous process. The
      * seeded value is genuinely confirmed (those offsets were committed
      * by the recovered checkpoint), so treating it as current-epoch is
      * exact, not a heuristic. Monotone: never lowers a live frontier
      * (a same-process restart may already be ahead). */
    def seed(member: String, frontier: Long, lease: Long = -1L): Unit = synchronized {
      members.get(member).foreach { st =>
        if (lease < 0 || st.lease == lease) {
          val cur = if (st.epoch == groupEpoch) st.frontier else None
          st.frontier = Some(math.max(cur.getOrElse(Long.MinValue), frontier))
          st.epoch = groupEpoch
          st.lastData = System.nanoTime()
        }
      }
    }

    def frontiers: Map[String, Option[Long]] = synchronized {
      members.map { case (n, st) => n -> st.frontier }.toMap
    }

    def audit: Seq[Admission] = synchronized { auditLog.toVector }

    /** Lifetime count of admissions whose new frontier exceeded the
      * effective bound they were checked against. NOT an independent oracle
      * of the admission rule (the bound is the one the count used — a
      * mis-computed bound passes its own check): it trips on the
      * state-corruption classes a rule-level check can't see — a member
      * violating the ascending-`values` contract (count(_ <= eff) admits
      * n values but values(n-1) lands past eff), or a future edit deriving
      * the count from a different variable than the recorded bound. The
      * rule itself is pinned independently by the replayed reference plans
      * in SyncGroupSpec. Unlike [[audit]] (bounded, trims its head on long
      * runs) this never forgets: drain rungs assert `violationCount == 0`
      * without racing the audit trim. */
    def violationCount: Long = synchronized { violationCnt }
    private var violationCnt = 0L

    private def satAdd(a: Long, b: Long): Long =
      if (a > 0 && b > Long.MaxValue - a) Long.MaxValue else a + b

    /** `values`: sync values of the member's next pending UNITS, ascending
      * (the member replays in sync order). For a multi-row unit (a spool
      * file) a unit's value is its MAX — the value the whole unit must
      * pass the bound with. `heads` (optional, same length) carries each
      * unit's PROPOSED value — its MIN, the reference's
      * `next_proposed_value` = the next single value the member would
      * send; omitted means single-value units (heads == values). Peers'
      * anticipation windows use heads; admission counting and the
      * deadlock raise use values. Returns how many units may be admitted
      * in this micro-batch and advances the member's frontier.
      *
      * Rule — the reference's `max_possible_value` recalculation ported
      * verbatim (synchronization.rs:19-49,548-661; its observable behavior
      * is replayed plan-by-plan in SyncGroupSpec): a value v is admissible
      * iff v ≤ bound and v ≤ every active strictly-higher-priority member's
      * confirmed frontier (an unconfirmed leader blocks — the leader reads
      * first), where
      *
      *   term(peer)  = max(frontier + maxDifference, pending head)
      *                 — a peer that has reported NEITHER this epoch makes
      *                 admission undecidable: block (one trigger for a live
      *                 peer; forever for a no-data member without idleMs,
      *                 the reference's documented idle-blocking)
      *   bound       = max( min over active peers of term,
      *                      max confirmed frontier of ALL members )
      *   deadlock    : if every active member (caller included) has a
      *                 pending head and none is admissible under the global
      *                 threshold, raise bound to the TOP-priority members'
      *                 smallest pending head — the leaders advance and
      *                 unblock the rest (this is how the reference passes
      *                 its [0,100]p1/[0,1]p0 plan)
      *
      * There is no unbounded laggard catch-up: a one-sided value jump past
      * every peer's reach stays held (reference holds 1000 in plan
      * [50,10,100]/[10,1000] and 100 in [0,100]/[0,1] forever); a
      * group-wide gap passes because both pending heads anticipate it. */
    def admit(member: String, values: Seq[Long], lease: Long = -1L,
        heads: Option[Seq[Long]] = None): Int = synchronized {
      val hd = heads.getOrElse(values)
      require(hd.length == values.length,
        s"heads (${hd.length}) and values (${values.length}) must align")
      // A superseded stream instance (an older lease — e.g. a previous run's
      // drained stream planning one last trigger while its replacement
      // constructs) is ignored entirely: letting it through would re-prove
      // "liveness" for a dead stream and re-trust its stale end-of-run
      // frontier right after a peer's resetMember distrusted it. lease < 0
      // (direct coordinator use, specs) bypasses the check.
      if (lease >= 0 && members.get(member).exists(_.lease != lease)) return 0
      // Liveness is proven by the CALL, not by pending data: admit is only
      // invoked from a CURRENT stream's latestOffset planning, so even an
      // empty-handed member (drained, or recovered with nothing pending) is
      // current in the group epoch. Refreshing the epoch here keeps a
      // drained member's REAL frontier pacing its peers after a peer's
      // resetMember bumps groupEpoch — an un-refreshed epoch would distrust
      // that frontier forever (treated as MinValue), letting the restarted
      // peer admit one bootstrap batch and then zero rows every trigger:
      // the group would stall instead of aligning to the drained member.
      members.get(member).foreach { st =>
        st.epoch = groupEpoch
        // report the pending head even during assembly / before the
        // early-outs below: peers' windows anticipate it, and a drained
        // member (empty values) must DROP its stale head so its
        // contribution falls back to its admitted frontier
        st.pendingHead = hd.headOption
        st.pendingUnit = values.headOption
      }
      if (members.size < expectedSize) {
        // a member waiting out assembly is NOT idle — keep lastData fresh
        // or its peer would idle-exclude it right after assembly completes
        members.get(member).foreach { st =>
          if (values.nonEmpty) st.lastData = System.nanoTime()
        }
        return 0 // group not fully assembled
      }
      val st = members(member)
      if (values.isEmpty) return 0 // no pending data: candidate for idle exclusion
      val now = System.nanoTime()
      st.lastData = now
      def active(s: MemberState): Boolean =
        s.idleMs.forall(ms => (now - s.lastData) / 1000000L <= ms)
      val others = members.valuesIterator
        .filter(s => (s ne st) && active(s)).toSeq
      // a member's bound contribution: where its confirmed frontier allows
      // peers to go, or where its next pending unit will take it — the
      // higher of the two (reference `source_threshold`); None = nothing
      // reported this epoch, admission undecidable
      def term(s: MemberState): Option[Long] = {
        val lrv = trusted(s).map(satAdd(_, maxDifference))
        val npv = if (s.epoch == groupEpoch) s.pendingHead else None
        (lrv ++ npv).maxOption
      }
      val activeAll = st +: others
      // strictly-higher-priority gate FOR member s: blocked while ANY
      // active leader of s has not confirmed up to the candidate
      // (reference higher_prioritized_source_is_behind — an unconfirmed
      // leader blocks). Evaluated against s's own peer set: the caller can
      // be another member's leader
      def hpGate(s: MemberState): Long = {
        val hp = activeAll.filter(o => (o ne s) && o.priority > s.priority)
        if (hp.isEmpty) Long.MaxValue
        else hp.map(trusted(_).getOrElse(Long.MinValue)).min
      }
      val (n, boundUsed) =
        if (others.isEmpty) (values.length, None)
        else {
          val terms = others.map(term)
          if (terms.exists(_.isEmpty)) (0, None)
          else {
            val minPeerTerm = terms.flatten.min
            // never below any confirmed frontier, idle members included
            // (reference: max_possible_value never contradicts already
            // confirmed entries)
            val floor = members.valuesIterator.flatMap(trusted)
              .maxOption.getOrElse(Long.MinValue)
            var bound = math.max(minPeerTerm, floor)
            // deadlock resolution: every active member has a pending unit
            // and none passes the GLOBAL threshold (own terms included) —
            // raise to the whole next UNIT of the top-priority member
            // with the smallest proposed HEAD. The reference recalculates
            // from the highest-priority group's next_proposed_value; with
            // single-value units head == unit and this is that rule
            // verbatim, while for multi-row units the laggard's (smallest
            // head's) whole unit must clear the bound or nothing can
            // actually move — a min-of-unit-maxes raise could admit a
            // NON-laggard past the laggard's head and then wedge.
            // unitOf(st) and term(st) read the state recorded at entry,
            // so the caller needs no special case
            def unitOf(s: MemberState): Option[Long] =
              if (s.epoch == groupEpoch) s.pendingUnit else None
            // term(st) is always defined here: the caller's pendingHead
            // was just recorded and values is non-empty
            val tGlobal = math.max(math.min(minPeerTerm, term(st).get), floor)
            val allHavePending = activeAll.forall(unitOf(_).isDefined)
            val anyAdmissible = activeAll.exists(s =>
              unitOf(s).exists(u => u <= tGlobal && u <= hpGate(s)))
            if (allHavePending && !anyAdmissible) {
              val maxPrio = activeAll.map(_.priority).max
              activeAll.filter(s => s.priority == maxPrio && unitOf(s).isDefined)
                .minByOption(s => (s.pendingHead.get, s.pendingUnit.get))
                .foreach(s => bound = math.max(bound, s.pendingUnit.get))
            }
            val eff = math.min(bound, hpGate(st))
            (values.count(_ <= eff), Some(eff))
          }
        }
      if (n > 0) {
        val newF = math.max(st.frontier.getOrElse(Long.MinValue), values(n - 1))
        st.frontier = Some(newF)
        st.pendingHead = if (n < values.length) Some(hd(n)) else None
        st.pendingUnit = if (n < values.length) Some(values(n)) else None
        auditLog += Admission(member, newF, boundUsed)
        if (boundUsed.exists(newF > _)) violationCnt += 1
        // bounded audit: one admission per member per micro-batch forever
        // would leak driver memory on a long-running stream
        if (auditLog.length > 16384) auditLog.remove(0, auditLog.length - 8192)
      }
      n
    }
  }

  private[sources] val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val groups = new java.util.concurrent.ConcurrentHashMap[String, Coordinator]()

  /** Get-or-create the named group — the
    * `register_input_synchronization_group` analog. All members must agree
    * on `maxDifference` (same contract as the reference's single
    * `max_difference` per group). */
  def group(name: String, maxDifference: Long): Coordinator = {
    val c = groups.computeIfAbsent(name, _ => new Coordinator(name, maxDifference))
    require(c.maxDifference == maxDifference,
      s"sync group '$name' already registered with maxDifference=${c.maxDifference}")
    c
  }

  /** Drop a group (test isolation / re-registration). */
  def reset(name: String): Unit = groups.remove(name)

  /** BATCH analog of the group invariant — the aligned snapshot of a
    * multi-source backfill: with global frontier F = min over sources of
    * max(syncCol), a synchronized reader would have admitted exactly the
    * rows with syncCol ≤ F + maxDifference by the time the slowest source
    * drained. One tiny per-source max aggregation broadcast back onto the
    * union — no shuffle of the data side. Output: input columns plus
    * `source`. */
  def alignedCut(sources: Seq[(String, DataFrame)], syncCol: String,
      maxDifference: Long): DataFrame = {
    require(sources.size >= 2, "a synchronization group needs >= 2 sources")
    val tagged = sources.map { case (n, df) =>
      df.withColumn("source", lit(n)) }.reduce(_ unionByName _)
    val frontier = tagged.groupBy("source")
      .agg(max(col(syncCol)).as("_mx"))
      .agg(min(col("_mx")).as("_f"))
    tagged.crossJoin(broadcast(frontier))
      .filter(col(syncCol) <= col("_f") + lit(maxDifference))
      .drop("_f")
  }
}

/** `format("graft.sources.SyncedReplaySource")` — the [[ReplaySource]]
  * deterministic replay source with its offset advance gated by an
  * [[InputSynchronization.Coordinator]]. Options: `path`, `syncCol`
  * (Long-castable replay/sync column), `rowsPerBatch`, `group`, `member`,
  * `maxDifference`, optional `priority`, `idleMs`, and `groupSize` (the
  * declared member count — set it so the first-constructed member cannot
  * drain unsynchronized before its peers' streams initialize).
  *
  * DEMO source: it holds the table's whole sync-value array on the driver
  * (the one unbounded-by-contract collect in the codebase — r14 audit) to
  * demonstrate the V2 admission surface at row granularity. Production
  * code and the board row use [[SyncedSpoolSource]], which plans from
  * per-file aggregates and never collects row data. */
@deprecated("demo source (driver-resident sync array); use SyncedSpoolSource", "r15")
class SyncedReplaySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    org.apache.spark.sql.SparkSession.active.read.parquet(options.get("path")).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new SyncedReplayTable(schema, opts.get("path"), opts.get("synccol"),
      opts.getInt("rowsperbatch", 100), opts.get("group"), opts.get("member"),
      opts.getLong("maxdifference", Long.MaxValue),
      opts.getInt("priority", 0),
      Option(opts.get("idlems")).map(_.toLong),
      opts.getInt("groupsize", 0))
  }
}

private[sources] class SyncedReplayTable(tableSchema: StructType, path: String,
    syncCol: String, rowsPerBatch: Int, groupName: String, member: String,
    maxDifference: Long, priority: Int, idleMs: Option[Long], groupSize: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-synced-replay($path as $member@$groupName)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = tableSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new SyncedReplayStream(path, syncCol, rowsPerBatch, groupName, member,
          maxDifference, priority, idleMs, groupSize)
    }
}

private[sources] class SyncedReplayStream(path: String, syncCol: String,
    rowsPerBatch: Int, groupName: String, member: String, maxDifference: Long,
    priority: Int, idleMs: Option[Long], groupSize: Int)
    extends MicroBatchStream with SupportsAdmissionControl {
  private def spark = org.apache.spark.sql.SparkSession.active
  private val coordinator = InputSynchronization.group(groupName, maxDifference)
  private val lease = coordinator.register(member, priority, idleMs)
  if (groupSize > 0) coordinator.expectGroupSize(groupSize)
  // the replay table's sync values in admission order (driver-resident —
  // this source demonstrates the V2 admission surface, like ReplaySource).
  // A non-numeric sync column casts to null and Row.getLong would silently
  // read 0 — frontiers all-zero, admission gating disabled with no symptom;
  // the reference rejects such columns at registration (test_io.py:3849
  // "Fields of type str are not supported in connector groups"), so fail
  // loudly here too
  private lazy val syncVals: Array[Long] = {
    val rows = spark.read.parquet(path)
      .select(org.apache.spark.sql.functions.col(syncCol).cast("long"))
      .orderBy(syncCol).collect()
    val bad = rows.count(_.isNullAt(0))
    require(bad == 0, s"sync column '$syncCol' of $path has $bad value(s) " +
      "that do not cast to long — synchronization groups need a numeric " +
      "(or epoch-time) sync column")
    rows.map(_.getLong(0))
  }

  // ONCE per stream instance: the engine may consult initialOffset again
  // while batch 0's offset commit is in flight, and a second reset would
  // wipe this member's LIVE frontier mid-replay — the peer then sees a
  // never-started member and catch-up-drains unsynchronized (observed
  // under load in SyncGroupSpec before the guard).
  private var didReset = false
  override def initialOffset(): Offset = {
    // a FRESH query (no checkpoint) starts its replay from rank 0: clear
    // this member's frontier so a previous run's admissions (the
    // coordinator is JVM-global) can't disable gating for the new replay.
    // Checkpoint recovery does NOT call initialOffset — the carried
    // frontier then matches the recovered offsets.
    if (!didReset) { coordinator.resetMember(member); didReset = true }
    ReplayOffset(0L)
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("paced via latestOffset(start, limit)")
  private var seeded = false
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ReplayOffset].rank
    // checkpoint recovery in a fresh process (initialOffset not called,
    // start > 0, coordinator empty): seed the recovered confirmed
    // frontier — syncVals(s-1) IS the last committed sync value — so a
    // member that recovers drained still paces its peers (see
    // Coordinator.seed). A fresh query passes here with s == 0.
    if (!seeded) {
      if (s > 0) coordinator.seed(member, syncVals((s - 1).toInt), lease)
      seeded = true
    }
    val e = math.min(s + rowsPerBatch, syncVals.length.toLong)
    val candidates = syncVals.slice(s.toInt, e.toInt)
    ReplayOffset(s + coordinator.admit(member, candidates.toSeq, lease))
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def reportLatestOffset(): Offset = ReplayOffset(syncVals.length.toLong)
  override def deserializeOffset(json: String): Offset = ReplayOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = coordinator.deregister(member, lease)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ReplayOffset].rank
    val e = end.asInstanceOf[ReplayOffset].rank
    if (e <= s) return Array.empty
    Array(ReplaySlice(ReplayUtil.rankedSlice(spark, path, syncCol, s, e)))
  }

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val it = partition.asInstanceOf[ReplaySlice].rows.iterator
      new PartitionReader[InternalRow] {
        override def next(): Boolean = it.hasNext
        override def get(): InternalRow = it.next()
        override def close(): Unit = ()
      }
    }
  }
}
