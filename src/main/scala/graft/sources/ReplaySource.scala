package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util

/** Custom DataSource V2 streaming source: `format("graft-replay")` —
  * deterministic paced replay of a static parquet table (reference
  * `pw.demo.replay_csv[_with_time]`, demo/__init__.py:29-257, and the
  * extension point behind `io/python` custom connectors,
  * `data_storage/python.rs`).
  *
  * Options: `path` (parquet dir), `orderCol` (replay order), `rowsPerBatch`.
  * Offsets are row ranks in `orderCol` order, so recovery and replanning are
  * exactly reproducible (the reference's wall-clock pacing trades that
  * determinism away; pace here = rowsPerBatch × trigger interval).
  *
  * Like Spark's own MemoryStream/socket demo sources, each micro-batch's
  * (bounded, `rowsPerBatch`-sized) slice is planned on the driver and shipped
  * inside the InputPartition — this source exists to exercise the V2
  * extension surface the reference's custom-connector API maps onto, not to
  * replace the file source for bulk ingest.
  */
class ReplaySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    org.apache.spark.sql.SparkSession.active.read.parquet(options.get("path")).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ReplayTable(schema, opts.get("path"),
      opts.get("ordercol"), opts.getInt("rowsperbatch", 100))
  }
}

private[sources] class ReplayTable(tableSchema: StructType, path: String,
    orderCol: String, rowsPerBatch: Int) extends Table with SupportsRead {
  override def name(): String = s"graft-replay($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = tableSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ReplayStream(path, orderCol, rowsPerBatch)
    }
}

private[sources] case class ReplayOffset(rank: Long) extends Offset {
  override def json(): String = rank.toString
}

private[sources] class ReplayStream(path: String, orderCol: String,
    rowsPerBatch: Int) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  private def spark = org.apache.spark.sql.SparkSession.active
  private lazy val total: Long = spark.read.parquet(path).count()
  // AvailableNow drains batch-by-batch up to the offset pinned at prepare time
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit = { availableNowTarget = Some(total) }

  override def initialOffset(): Offset = ReplayOffset(0L)
  // admission control paces the replay: at most rowsPerBatch ranks per
  // micro-batch, and AvailableNow drains batch-by-batch to reportLatestOffset
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("paced via latestOffset(start, limit)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    ReplayOffset(math.min(start.asInstanceOf[ReplayOffset].rank + rowsPerBatch,
      availableNowTarget.getOrElse(total)))
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def reportLatestOffset(): Offset =
    ReplayOffset(availableNowTarget.getOrElse(total))
  override def deserializeOffset(json: String): Offset = ReplayOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ReplayOffset].rank
    val e = end.asInstanceOf[ReplayOffset].rank
    if (e <= s) return Array.empty
    Array(ReplaySlice(ReplayUtil.rankedSlice(spark, path, orderCol, s, e)))
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

private[sources] case class ReplaySlice(rows: Array[InternalRow]) extends InputPartition

/** Shared driver-side ranked slicing for the replay-style sources. */
private[sources] object ReplayUtil {
  /** Rank the table deterministically and collect rows with rank in (s, e].
    * Equal orderCol values tie-break on a hash of the JSON-rendered row so
    * the rank is STABLE across calls — a batch boundary splitting a tie
    * group must not emit a row twice / drop its sibling. to_json (a) makes
    * map/array/binary columns hashable (raw xxhash64 rejects MapType) and
    * (b) renders null fields distinct by OMITTING them, so rows with
    * symmetric null patterns don't collide the way positionless hash
    * folding would. Rows are assumed distinct — the replay-table contract.
    *
    * CHECKPOINT COMPATIBILITY: this tie-break (r13) changed the rank order
    * relative to offsets checkpointed by earlier builds — resuming an OLD
    * checkpoint whose batch boundary split a tie group can re-emit one tied
    * row and drop its sibling, once, at that boundary. Discard pre-r13
    * checkpoints. (Acceptable for a demonstration/replay source; the
    * per-batch global window + to_json cost is likewise demo-scale.) */
  def rankedSlice(spark: org.apache.spark.sql.SparkSession, path: String,
      orderCol: String, lo: Long, hi: Long): Array[InternalRow] = {
    import org.apache.spark.sql.functions._
    val src = spark.read.parquet(path)
    val tieBreak = xxhash64(to_json(struct(src.columns.map(col).toIndexedSeq: _*)))
    src
      .withColumn("_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col(orderCol), tieBreak))
        .cast("long"))
      .filter(col("_rank") > lo && col("_rank") <= hi)
      .drop("_rank")
      .queryExecution.executedPlan.executeCollect()
      .map(_.copy())
  }
}
