package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Polling snapshot-diff CDC — the reference's SQLite connector semantics
  * (src/connectors/data_storage/sqlite.rs:695 `stored_state` keyed snapshot;
  * io/sqlite; replayed from tests/test_sqlite.py:26): poll the table, diff
  * the fresh snapshot against the tracked one, and emit a changelog —
  *   - a key only in the new snapshot        → +1 with the new values
  *   - a key only in the tracked snapshot    → −1 with the old values
  *   - a key in both with ANY value changed  → −1 old AND +1 new (same poll)
  *
  * Scale shape: the reference keys its snapshot by SQLite's implicit rowid
  * and holds it in a single-process HashMap; here the key is the declared
  * primary key and the diff is ONE full-outer equi-join per poll — fully
  * distributed, no driver-side state. The tracked snapshot persists as
  * parquet (restart-safe), so a 10⁹-row dimension polls in O(join), not
  * O(driver memory). Works over any snapshot source — `Connectors.jdbc`
  * (SQLite/Postgres/Derby via their JDBC drivers), parquet, or anything
  * else that yields a DataFrame.
  */
object PollingCdc {

  private val liveDiffs =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Diff `curr` against `prev` on `keys` → changelog (key + value columns
    * + `diff` int). Both frames must share a schema; `keys` must be unique
    * per frame (the reference tracks one state entry per key,
    * sqlite.rs:1158). */
  def snapshotDiff(prev: DataFrame, curr: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = curr.columns.filterNot(keys.contains).toSeq
    require(!curr.columns.contains("diff"),
      "column name 'diff' is reserved by the changelog (the reference " +
        "rejects reserved column names in stream mode the same way)")
    require(curr.columns.sorted.sameElements(prev.columns.sorted),
      s"snapshot schema changed: ${prev.columns.mkString(",")} -> ${curr.columns.mkString(",")}")

    val p = prev.select(
      keys.map(col) ++ valueCols.map(c => col(c).as(s"_old_$c")) :+ lit(true).as("_in_prev"): _*)
    val c = curr.select(
      keys.map(col) ++ valueCols.map(c0 => col(c0).as(s"_new_$c0")) :+ lit(true).as("_in_curr"): _*)
    val joined = p.join(c, keys, "full_outer")

    val changed: org.apache.spark.sql.Column =
      if (valueCols.isEmpty) lit(false)
      else valueCols.map(v => !(col(s"_old_$v") <=> col(s"_new_$v"))).reduce(_ || _)
    val inPrev = coalesce(col("_in_prev"), lit(false))
    val inCurr = coalesce(col("_in_curr"), lit(false))

    // each join row contributes 0-2 changelog rows: a retraction of the old
    // image and/or an insertion of the new one (sqlite.rs:1141-1161 ordering)
    val oldImage = struct(valueCols.map(v => col(s"_old_$v").as(v)) :+ lit(-1).as("diff"): _*)
    val newImage = struct(valueCols.map(v => col(s"_new_$v").as(v)) :+ lit(1).as("diff"): _*)
    val events = when(inPrev && inCurr && changed, array(oldImage, newImage))
      .when(inPrev && !inCurr, array(oldImage))
      .when(!inPrev && inCurr, array(newImage))
      .otherwise(slice(array(oldImage), 1, 0)) // typed empty: unchanged rows vanish at explode

    joined
      .select(keys.map(col) :+ explode(events).as("_e"): _*)
      .select(keys.map(col) ++ valueCols.map(v => col(s"_e.$v")) :+ col("_e.diff"): _*)
  }

  /** Persistent poll state: the tracked snapshot as parquet under `dir`
    * (alternating slot dirs so a crashed write never corrupts the tracked
    * image). `step(curr)` returns the changelog vs the tracked snapshot and
    * advances it. */
  final class SnapshotState(spark: SparkSession, dir: String, keys: Seq[String]) {
    private val fsPath = new java.io.File(dir)
    private def slotFile = new java.io.File(fsPath, "SLOT")
    private def slotDir(n: Int) = new java.io.File(fsPath, s"snap_$n").toString

    private def currentSlot: Option[Int] = {
      if (!slotFile.exists()) None
      else Some(new String(java.nio.file.Files.readAllBytes(slotFile.toPath), "UTF-8").trim.toInt)
    }

    def tracked(schemaOf: DataFrame): DataFrame = currentSlot match {
      case Some(n) => spark.read.parquet(slotDir(n))
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemaOf.schema)
    }

    def step(curr: DataFrame): DataFrame = {
      fsPath.mkdirs()
      val next = currentSlot.map(n => 1 - n).getOrElse(0)
      // materialize the fresh snapshot FIRST (the JDBC scan must not run
      // twice with different results between diff and track)
      curr.write.mode("overwrite").parquet(slotDir(next))
      val frozen = curr.sparkSession.read.parquet(slotDir(next))
      val out = snapshotDiff(tracked(frozen), frozen, keys)
      val diffed = out.cache()
      diffed.count() // force before the slot flips (the next poll overwrites
                     // the old slot the lazy plan would still reference)
      // release the previous poll's cached diff — keyed on the state dir so
      // per-call wrappers (jdbcPollStep/fsPollStep) release across instances:
      // a long-polling session holds at most ONE diff per state in the
      // block manager
      val key = fsPath.getCanonicalPath
      Option(PollingCdc.liveDiffs.put(key, diffed))
        .foreach(_.unpersist(blocking = false))
      java.nio.file.Files.write(slotFile.toPath, next.toString.getBytes("UTF-8"))
      diffed
    }
  }

  /** Poll a JDBC table with the reference's sqlite.read semantics: each call
    * reads a fresh snapshot and returns the changelog vs the last call.
    * `stateDir` carries the tracked snapshot across calls (and restarts). */
  def jdbcPollStep(spark: SparkSession, url: String, table: String,
      keys: Seq[String], stateDir: String): DataFrame =
    new SnapshotState(spark, stateDir, keys).step(Connectors.jdbc(spark, url, table))

  /** Filesystem CDC — the reference's streaming fs source WITH deletion/
    * modification tracking (data_storage/file.rs scanner; replayed from
    * test_io.py:1370-1601 test_simple_replacement variants,
    * insert_consolidation, file_removal): overwriting a file retracts its
    * old rows and inserts the
    * new ones; deleting a file retracts its rows. Spark's native file stream
    * is append-only (new files only), so this mode re-reads the glob per
    * poll and snapshot-diffs — right for mutable dimension directories;
    * keep append-only event directories on `Connectors.*(Streaming)`.
    *
    * `keys`: the schema primary key when one exists; pass
    * `_metadata_path` + content columns for the reference's
    * autogenerated-key mode (rows key to their file, so a file swap
    * retracts only that file's rows). A vanished path diffs as
    * all-retractions (the reference's file-removal semantics). */
  def fsPollStep(spark: SparkSession, keys: Seq[String], stateDir: String,
      readSnapshot: () => DataFrame,
      emptySchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val curr =
      try readSnapshot()
      catch { case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
      }
    new SnapshotState(spark, stateDir, keys).step(curr)
  }

  /** Drive a poll step as a LIVE Structured Streaming query (the
    * reference's connector mode: autocommit_duration_ms paces the polls) —
    * each trigger runs one snapshot-diff poll and hands the changelog to
    * `onChangelog` (a sink write, a foreachBatch merge, …). The pacing
    * rides a 1-row-per-trigger rate stream; the poll itself is the same
    * distributed diff as the batch form, so a restart resumes from the
    * parquet-tracked snapshot (checkpointing the rate stream is
    * unnecessary — the SnapshotState IS the source's durable state). */
  /** Duration-typed form: `refreshInterval` accepts the reference's full
    * duration vocabulary — seconds as int/float, or a timedelta-like
    * (java.time.Duration / FiniteDuration) — validated through
    * [[Durations.asDurationSeconds]] (zero = poll as fast as possible). */
  def pollingStream(spark: SparkSession, refreshInterval: Any,
      step: () => DataFrame, onChangelog: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val secs = Durations.asDurationSeconds(refreshInterval, "refresh_interval")
    pollingStream(spark, math.round(secs * 1000.0), step)(onChangelog)
  }

  def pollingStream(spark: SparkSession, intervalMs: Long,
      step: () => DataFrame)(onChangelog: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    spark.readStream.format("rate")
      .option("rowsPerSecond", math.max(1, 1000 / math.max(1, intervalMs)))
      .load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(intervalMs))
      .foreachBatch { (_: DataFrame, _: Long) =>
        val diff = step()
        if (!diff.isEmpty) onChangelog(diff)
      }
      .start()
  }

  /** fs.read(format="only_metadata") (test_io.py:4271 test_fs_metadata_only):
    * one row per FILE carrying only its metadata; a rewritten file retracts
    * the old metadata row and inserts the new one, a removed file retracts.
    * The snapshot is the `binaryFile` source's metadata columns — column
    * pruning keeps content bytes unread — diffed per poll on the full
    * metadata (path, size, mtime), so ANY change to a file shows as
    * retract+insert. */
  def fsMetadataPollStep(spark: SparkSession, path: String,
      stateDir: String): DataFrame = {
    val keys = Seq("_metadata_path", "_metadata_size", "_metadata_modified_at")
    fsPollStep(spark, keys, stateDir,
      () => spark.read.format("binaryFile").load(path)
        .select(col("path").as("_metadata_path"),
          col("length").as("_metadata_size"),
          col("modificationTime").as("_metadata_modified_at")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_metadata_path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_metadata_size",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_metadata_modified_at",
          org.apache.spark.sql.types.TimestampType))))
  }

  /** [[fsPollStep]] over schema-typed JSON-lines (the fixtures' format). */
  def fsJsonlinesPollStep(spark: SparkSession, path: String,
      schema: graft.core.PwSchema, keys: Seq[String], stateDir: String,
      fieldPaths: Map[String, String] = Map.empty): DataFrame =
    fsPollStep(spark, keys, stateDir,
      () => Connectors.jsonlinesTyped(spark, path, schema, fieldPaths)
        .drop(graft.functions.Errors.ErrCol),
      org.apache.spark.sql.types.StructType(schema.cols.map(c =>
        org.apache.spark.sql.types.StructField(c.name, c.dtype))))
}
