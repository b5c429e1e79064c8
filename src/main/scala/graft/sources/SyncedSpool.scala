package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util
import scala.collection.mutable

/** `format("graft.sources.SyncedSpoolSource")` — input-synchronization-group
  * admission (reference `python/pathway/io/_synchronization.py:59`) over a
  * spool DIRECTORY of JSON-lines files: the [[Http.restConnector]] spool
  * contract, and the group's NON-COLLECTED member shape. Unlike
  * [[SyncedReplaySource]] (which demonstrates the admission surface over a
  * driver-resident sorted value array), no row data ever touches the
  * driver here:
  *
  *   - planning (`latestOffset`) lists the spool and computes each NEW
  *     file's sync range — `(min, max)` of `syncCol` over that file —
  *     ONCE, via a single aggregate-only Spark job per trigger batched
  *     across the new files (`input_file_name()` grouping). The cache
  *     holds two Longs per file, O(files) driver memory, never the table;
  *   - the coordinator admits whole files (the group granularity: a
  *     lagging member "reads more to catch up" one file at a time, the
  *     reference's batch-granular alignment), so the member's advanced
  *     frontier IS the max of syncCol over the slice it just committed;
  *   - executors read the admitted files' bytes directly (Hadoop
  *     FileSystem, so any shared-FS spool works) and emit raw lines as a
  *     single `value: string` column — parse with `from_json` downstream.
  *
  * Contract (documented, checked loudly): spool file names are
  * lexicographically monotone in arrival order (sequence or timestamp
  * prefixes — the atomic write-then-rename spool pattern), and arrival
  * order is sync order, the same "member replays in sync order" contract
  * [[InputSynchronization.Coordinator.admit]] states. A late file sorting
  * below the committed frontier would corrupt rank offsets; it throws
  * rather than silently reordering.
  *
  * Options: `path` (spool dir), `syncCol` (Long-castable field inside the
  * JSON), `filesPerBatch`, `group`, `member`, `maxDifference`, optional
  * `priority`, `idleMs`, `groupSize`, and `compact` (default false: move
  * each committed file into `_processed/` after its batch commits, so the
  * per-trigger directory listing — the one O(files) planning term — scans
  * only the unprocessed tail; see [[SyncedSpoolStream.commit]]).
  */
class SyncedSpoolSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyncedSpool.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new SyncedSpoolTable(opts.get("path"), opts.get("synccol"),
      opts.getInt("filesperbatch", 10), opts.get("group"), opts.get("member"),
      opts.getLong("maxdifference", Long.MaxValue),
      opts.getInt("priority", 0),
      Option(opts.get("idlems")).map(_.toLong),
      opts.getInt("groupsize", 0),
      opts.getBoolean("compact", false))
  }
}

private[sources] object SyncedSpool {
  val schema: StructType = new StructType().add("value", StringType)
}

private[sources] class SyncedSpoolTable(path: String, syncCol: String,
    filesPerBatch: Int, groupName: String, member: String,
    maxDifference: Long, priority: Int, idleMs: Option[Long], groupSize: Int,
    compact: Boolean)
    extends Table with SupportsRead {
  override def name(): String = s"graft-synced-spool($path as $member@$groupName)"
  override def schema(): StructType = SyncedSpool.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = SyncedSpool.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new SyncedSpoolStream(path, syncCol, filesPerBatch, groupName, member,
          maxDifference, priority, idleMs, groupSize, compact)
    }
}

private[sources] class SyncedSpoolStream(path: String, syncCol: String,
    filesPerBatch: Int, groupName: String, member: String, maxDifference: Long,
    priority: Int, idleMs: Option[Long], groupSize: Int, compact: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl {
  private def spark = org.apache.spark.sql.SparkSession.active
  private val coordinator = InputSynchronization.group(groupName, maxDifference)
  private val lease = coordinator.register(member, priority, idleMs)
  if (groupSize > 0) coordinator.expectGroupSize(groupSize)

  /** fileName -> (min, max) of syncCol in that file; two Longs per file
    * ever seen. The MAX is the file's admission value (the whole file
    * must pass the bound) and the committed frontier; the MIN is the
    * file's proposed head — the next single value this member would
    * send, the reference's `next_proposed_value` — reported to the
    * coordinator so peers' anticipation windows do not run past this
    * member's confirmed frontier by the file's internal span. */
  private val frontierCache = mutable.HashMap.empty[String, (Long, Long)]
  /** Names admitted so far in rank order (rebuilt from the sorted listing
    * on checkpoint recovery — the monotone-naming contract makes sorted
    * order == admission order). Guards against late under-frontier files.
    * Entries of COMPACTED files point into `_processed/`. */
  private val admittedNames = mutable.ArrayBuffer.empty[String]

  private def fs = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def processedDir = new org.apache.hadoop.fs.Path(path, "_processed")

  /** Files already moved to `_processed/`, in rank order (the compacted
    * PREFIX of the spool — compaction only ever moves committed ranks, and
    * names keep their sort position, so the `_processed` listing sorted by
    * name IS ranks [0, compactedNames.length)). Read regardless of the
    * `compact` option: a spool compacted by a previous run must keep its
    * rank mapping even if this run turns compaction off. */
  private lazy val compactedNames: mutable.ArrayBuffer[String] = {
    val buf = mutable.ArrayBuffer.empty[String]
    val f = fs
    if (f.exists(processedDir))
      buf ++= f.listStatus(processedDir).iterator
        .filter(s => s.isFile && !s.getPath.getName.startsWith("."))
        .map(_.getPath.toString).toArray.sorted
    buf
  }

  /** Processed-file compaction (`compact=true`): after a batch's offset
    * commit, its files move into `_processed/` (same-FS rename), so the
    * per-trigger `listStatus` of the spool dir — the one O(files) planning
    * term (BASELINE r14: p50 177→291 ms at 300→7500 files) — scans only
    * the UNPROCESSED tail. Committed ranks resolve through
    * [[compactedNames]]; recovery and committed-batch replans read the
    * moved bytes from `_processed/` (names, order, and content are
    * preserved — the never-remove contract holds, relocated). */
  override def commit(end: Offset): Unit = if (compact) {
    val e = math.min(end.asInstanceOf[ReplayOffset].rank,
      admittedNames.length.toLong).toInt
    if (compactedNames.length < e) {
      val f = fs
      if (!f.exists(processedDir)) f.mkdirs(processedDir)
      while (compactedNames.length < e) {
        val i = compactedNames.length
        val src = new org.apache.hadoop.fs.Path(admittedNames(i))
        val dst = new org.apache.hadoop.fs.Path(processedDir, src.getName)
        // a failed rename leaves the file in place — rank mapping stays
        // consistent (the file is still found in the main listing); stop
        // compacting this round rather than leaving a gap in the prefix
        if (!f.rename(src, dst)) return
        admittedNames(i) = dst.toString
        compactedNames += dst.toString
      }
    }
  }

  /** Visible spool files, sorted by name. Hidden/tmp files (`.`-prefixed,
    * the write-then-rename staging names) are excluded. The last listing
    * is kept for same-trigger reuse (reportLatestOffset). */
  private var lastListing: Array[String] = _
  /** compactedNames.length at the moment [[lastListing]] was taken — the
    * two must be read as a PAIR: commit moves a batch's files into
    * _processed/ (growing compactedNames) while a stale listing still
    * contains them, so `compactedNames.length + lastListing.length` mixed
    * across triggers transiently overcounts by up to filesPerBatch. */
  private var lastListingCompacted: Int = 0
  private def listSorted(): Array[String] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val f = fs
    lastListing =
      if (!f.exists(dir)) Array.empty
      else f.listStatus(dir).iterator
        .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
        .map(_.getPath.toString).toArray.sorted
    lastListingCompacted = compactedNames.length
    lastListing
  }

  /** Decoded absolute path — the one spelling a file has regardless of
    * which API produced the string: `input_file_name()` renders a
    * percent-ENCODED `file:///…` URI, the listing's `Path.toString` a
    * decoded `file:/…` one; keying the cache on either raw form misses the
    * other (and a space in a file name would abort the query). */
  private def canonPath(s: String): String =
    try {
      val u = new java.net.URI(s)
      if (u.getPath != null) u.getPath
      else new org.apache.hadoop.fs.Path(s).toUri.getPath
    } catch { case _: java.net.URISyntaxException =>
      new org.apache.hadoop.fs.Path(s).toUri.getPath }

  /** Compute (once) and cache `max(syncCol)` for each of `files` — one
    * aggregate-only job batched across the uncached ones. ANY row without a
    * sync value (empty file, missing/null field, or a corrupt/mistyped line
    * that PERMISSIVE parsing nulls out) fails loudly: every raw line is
    * emitted downstream, so a null-sync row would slip past the group's
    * pacing while the aggregates over the parseable rows misstate the
    * frontier. Returns each file's (min, max): max = admission value +
    * committed frontier, min = proposed head (see [[frontierCache]]). */
  private def frontiersOf(files: Seq[String]): Seq[(Long, Long)] = {
    val missing = files.filterNot(f => frontierCache.contains(canonPath(f)))
    if (missing.nonEmpty) {
      import org.apache.spark.sql.functions._
      val st = new StructType().add(syncCol, LongType)
      spark.read.schema(st).json(missing: _*)
        .groupBy(input_file_name().as("_f"))
        .agg(min(col(syncCol)).as("_mn"), max(col(syncCol)).as("_mx"),
          count_if(col(syncCol).isNull).as("_bad"))
        .collect().foreach { r =>
          require(r.getLong(3) == 0L, s"spool file ${r.getString(0)} has " +
            s"${r.getLong(3)} row(s) without a parseable '$syncCol' sync value")
          frontierCache(canonPath(r.getString(0))) = (r.getLong(1), r.getLong(2))
        }
      val unresolved = missing.filterNot(f => frontierCache.contains(canonPath(f)))
      require(unresolved.isEmpty,
        s"spool file(s) without a '$syncCol' sync value: ${unresolved.mkString(", ")}")
    }
    files.map(f => frontierCache(canonPath(f)))
  }

  private var didReset = false
  override def initialOffset(): Offset = {
    // fresh query (no checkpoint): clear this member's JVM-global frontier
    // exactly once (see SyncedReplayStream.initialOffset)
    if (!didReset) { coordinator.resetMember(member); didReset = true }
    ReplayOffset(0L)
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("paced via latestOffset(start, limit)")
  /** Max sync frontier over files admitted so far — the other half of the
    * "arrival order is sync order" contract: names monotone AND per-file
    * frontiers non-decreasing. A producer that writes f2 (max t=50) after
    * f1 (max t=100) would otherwise slip rows past the group's pacing
    * (admit counts values ≤ eff anywhere in the window, but files commit
    * as a prefix). Rebuilt from the last committed file on recovery. */
  private var lastFrontier = Long.MinValue
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ReplayOffset].rank.toInt
    // GLOBAL rank order = compacted prefix (already-moved, name-sorted)
    // then the live listing — so a FRESH query (or an older checkpoint,
    // s < compacted) over a previously-compacted spool reprocesses the
    // moved files from _processed/ instead of silently skipping the
    // prefix (r15 review). The two parts are sliced lazily, never
    // concatenated: per-trigger work must stay O(unprocessed), not
    // O(spool age) — that term is what compaction flattens.
    val listed = listSorted()
    val nc = compactedNames.length
    // length check hoisted above the recovery rebuild: an emptied/shrunk
    // spool must hit the contract message, not admittedNames.last's
    // NoSuchElementException inside the rebuild (the prefix check must stay
    // BELOW it — before the rebuild admittedNames is legitimately empty)
    require(nc + listed.length >= s,
      s"spool $path lists ${nc + listed.length} files (incl. compacted) but " +
        s"rank $s was committed: files must never be removed or renamed")
    if (admittedNames.isEmpty && s > 0) { // checkpoint recovery (one-time)
      admittedNames ++= compactedNames.take(math.min(s, nc))
      admittedNames ++= listed.take(s - nc) // s < nc: take(neg) is empty
      lastFrontier = frontiersOf(Seq(admittedNames.last)).head._2
      // fresh-process recovery: the JVM-global coordinator starts empty,
      // and a member recovering over a drained/quiet spool would never
      // report a frontier — seed the recovered confirmed frontier so it
      // keeps pacing its peers (see Coordinator.seed)
      coordinator.seed(member, lastFrontier, lease)
    }
    // prefix check on the LIVE portion only: admittedNames' compacted
    // prefix IS compactedNames by construction (commit updates both in
    // step; recovery copies it), so re-comparing it every trigger would
    // be O(committed) self-comparison that can never fail
    require(listed.take(s - nc)
        .sameElements(admittedNames.view.slice(math.min(s, nc), s)),
      s"spool $path changed under the committed frontier (rank $s): file names " +
        "must be lexicographically monotone in arrival order and never removed")
    val pending: Seq[String] =
      if (s >= nc) listed.slice(s - nc, s - nc + filesPerBatch).toSeq
      else (compactedNames.view.slice(s, math.min(nc, s + filesPerBatch)) ++
        listed.take(math.max(0, s + filesPerBatch - nc))).toSeq
    val fronts = frontiersOf(pending)
    fronts.foldLeft(lastFrontier) { (prev, f) =>
      require(f._2 >= prev, s"spool $path violates the sync-order contract: a " +
        s"later file's max($syncCol)=${f._2} undercuts an earlier file's $prev — " +
        "arrival (name) order must be sync order")
      f._2
    }
    // values = per-file max (whole-file admission), heads = per-file min
    // (the next single value this member would send — peers anticipate
    // the head, not the file's far edge)
    val n = coordinator.admit(member, fronts.map(_._2), lease, Some(fronts.map(_._1)))
    admittedNames ++= pending.take(n)
    if (n > 0) lastFrontier = fronts(n - 1)._2
    ReplayOffset(s + n.toLong)
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxFiles(filesPerBatch)
  /** Progress-metrics probe only — reuses the trigger's listing instead of
    * a second full listStatus per micro-batch (an object-store spool with
    * thousands of files would pay double planning I/O otherwise). */
  override def reportLatestOffset(): Offset = {
    if (lastListing == null) listSorted()
    ReplayOffset(lastListingCompacted + lastListing.length.toLong)
  }
  override def deserializeOffset(json: String): Offset = ReplayOffset(json.toLong)
  override def stop(): Unit = coordinator.deregister(member, lease)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ReplayOffset].rank.toInt
    val e = end.asInstanceOf[ReplayOffset].rank.toInt
    if (e <= s) return Array.empty
    // recovery replan of a committed batch may arrive before any
    // latestOffset call: compacted prefix + sorted listing IS rank order
    // by contract (compaction only moves a committed name-ordered prefix)
    val files = if (admittedNames.length >= e) admittedNames.toSeq else {
      val listed = compactedNames.toSeq ++ listSorted()
      // a shrunk spool means committed files were deleted/renamed — replay
      // would silently read DIFFERENT bytes into an already-committed
      // batch; fail loudly instead. (A rename preserving sort position is
      // undetectable from a rank offset — the never-remove contract.)
      require(listed.length >= e,
        s"spool $path lists ${listed.length} files but batch [$s,$e) was " +
          "committed: files must never be removed or renamed")
      listed
    }
    files.slice(s, e).map(SpoolFilePartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    // driver-side capture of the session's Hadoop conf (spark.hadoop.*
    // credentials, endpoints, custom FS schemes) as a plain serializable
    // map — a bare `new Configuration()` on the executor would only see
    // classpath defaults and fail on any configured remote FS
    private val hadoopConfEntries: Array[(String, String)] = {
      val c = spark.sessionState.newHadoopConf()
      val it = c.iterator()
      val buf = mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = new org.apache.hadoop.fs.Path(
        partition.asInstanceOf[SpoolFilePartition].file)
      // executor-side: read THIS file's bytes from the shared FS — the
      // driver never sees row data
      val conf = new org.apache.hadoop.conf.Configuration(false)
      hadoopConfEntries.foreach { case (k, v) => conf.set(k, v) }
      val f = p.getFileSystem(conf)
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(f.open(p), java.nio.charset.StandardCharsets.UTF_8))
      new PartitionReader[InternalRow] {
        private var line: String = _
        override def next(): Boolean = {
          line = reader.readLine()
          while (line != null && line.isEmpty) line = reader.readLine()
          line != null
        }
        override def get(): InternalRow =
          new GenericInternalRow(Array[Any](UTF8String.fromString(line)))
        override def close(): Unit = reader.close()
      }
    }
  }
}

private[sources] case class SpoolFilePartition(file: String) extends InputPartition
