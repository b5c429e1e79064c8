package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Changelog-applying JDBC upsert sink (reference io/postgres snapshot mode,
  * python/pathway/io/postgres — "apply diffs" semantics from
  * concepts.md:240-243: diff=+1 upserts the row, diff=−1 deletes its key).
  *
  * Scale posture: rows stream per PARTITION through one connection with
  * batched statements — no driver collect anywhere (the r2 `upsertSink`
  * TrieMap stand-in collected each microbatch; it now lives in test scope
  * as `TestSinks.upsertSink`). Feed this sink a per-key netted changelog (e.g.
  * `StreamOps.streamToTable` output per microbatch) so the per-key winner is
  * decided upstream by Spark, not by row arrival order.
  *
  * Upsert lowering: batched UPDATE, then INSERT for keys whose update count
  * was 0 — portable across Derby/Postgres/MySQL (Derby's MERGE rejects
  * parameter markers in the ON clause). Integration-tested against embedded
  * Derby (the JDBC engine shipped with Spark) in JdbcSinkSpec.
  */
object JdbcSink {

  /** Uniform output-batching validation (test_io.py
    * test_output_rejects_nonpositive_max_batch_size): the flush threshold
    * is validated once, centrally, so the rule applies to every writer —
    * 0 would silently never trigger size-based batching and a negative
    * value is meaningless, so both fail up front with the reference's
    * message instead of surfacing as unbounded buffering. */
  private[graft] def validateBatchSize(n: Int): Unit =
    require(n > 0, "max_batch_size must be a positive integer")

  /** Apply one (micro)batch of changelog rows to `table` over JDBC.
    * `diffCol`, when present, routes rows: < 0 → DELETE by key, else upsert.
    * Runs as `foreachPartition` — executor-side, batched, no driver data. */
  def applyUpserts(batch: DataFrame, keyCols: Seq[String], url: String,
      table: String, diffCol: Option[String] = None,
      jdbcBatchSize: Int = 500): Unit = {
    validateBatchSize(jdbcBatchSize)
    val cols = batch.columns.toSeq
    val payload = cols.filterNot(diffCol.contains)
    val nonKeys = payload.filterNot(keyCols.contains)
    require(keyCols.forall(cols.contains), s"key columns $keyCols must be in ${cols}")
    require(nonKeys.nonEmpty, "need at least one non-key payload column")
    val keyIdx = keyCols.map(cols.indexOf)
    val nonKeyIdx = nonKeys.map(cols.indexOf)
    val diffIdx = diffCol.map(cols.indexOf)
    val updateSql = s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")}" +
      s" WHERE ${keyCols.map(c => s"$c = ?").mkString(" AND ")}"
    val insertSql = s"INSERT INTO $table (${payload.mkString(", ")})" +
      s" VALUES (${payload.map(_ => "?").mkString(", ")})"
    val deleteSql = s"DELETE FROM $table WHERE ${keyCols.map(c => s"$c = ?").mkString(" AND ")}"
    val payloadIdx = payload.map(cols.indexOf)

    batch.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val upd = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          val del = conn.prepareStatement(deleteSql)
          rows.grouped(jdbcBatchSize).foreach { group =>
            val (dels, ups) = group.partition(r => diffIdx.exists(i => r.getAs[Number](i).longValue() < 0))
            if (dels.nonEmpty) {
              dels.foreach { r =>
                keyIdx.zipWithIndex.foreach { case (ci, p) => del.setObject(p + 1, r.get(ci)) }
                del.addBatch()
              }
              del.executeBatch()
            }
            if (ups.nonEmpty) {
              ups.foreach { r =>
                nonKeyIdx.zipWithIndex.foreach { case (ci, p) => upd.setObject(p + 1, r.get(ci)) }
                keyIdx.zipWithIndex.foreach { case (ci, p) =>
                  upd.setObject(nonKeyIdx.size + p + 1, r.get(ci))
                }
                upd.addBatch()
              }
              val counts = upd.executeBatch()
              // drivers returning SUCCESS_NO_INFO (-2) report "executed,
              // unknown count" — only an exact 0 means the key was absent
              val misses = ups.zip(counts).collect { case (r, 0) => r }
              if (misses.nonEmpty) {
                misses.foreach { r =>
                  payloadIdx.zipWithIndex.foreach { case (ci, p) => ins.setObject(p + 1, r.get(ci)) }
                  ins.addBatch()
                }
                ins.executeBatch()
              }
            }
          }
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** Streaming writer: apply every microbatch's diffs to the JDBC table. */
  def upsertWriter(df: DataFrame, keyCols: Seq[String], url: String,
      table: String, diffCol: Option[String] = None): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      applyUpserts(batch, keyCols, url, table, diffCol)
    }

  /** stream_of_changes output mode (reference io duckdb/postgres
    * output_table_type="stream_of_changes"; r16 decode of
    * tests/test_io_duckdb.py:36-101): APPEND every changelog event —
    * (payload…, time, diff) — to the table; deletions are RECORDED as
    * diff=−1 rows, never applied; the payload must not itself contain the
    * reserved `time`/`diff` names (the reference raises ValueError). */
  def appendChangelog(batch: DataFrame, url: String, table: String,
      timeCol: String = "time", diffCol: String = "diff",
      jdbcBatchSize: Int = 500): Unit = {
    validateBatchSize(jdbcBatchSize)
    val cols = batch.columns.toSeq
    val reservedDup = cols.count(c => c == timeCol || c == diffCol)
    require(cols.contains(timeCol) && cols.contains(diffCol) && reservedDup == 2,
      s"stream_of_changes needs exactly the reserved $timeCol/$diffCol columns " +
        s"plus payload; got ${cols.mkString(", ")}")
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")})" +
      s" VALUES (${cols.map(_ => "?").mkString(", ")})"
    batch.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ins = conn.prepareStatement(insertSql)
          rows.grouped(jdbcBatchSize).foreach { group =>
            group.foreach { r =>
              cols.indices.foreach(i => ins.setObject(i + 1, r.get(i)))
              ins.addBatch()
            }
            ins.executeBatch()
          }
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** Snapshot-mode validation (test_io_duckdb.py:141-235 — the reference
    * rejects these at graph build): a snapshot sink REQUIRES a primary key;
    * key columns must exist, be distinct, non-nullable by schema, and
    * scalar (no array/struct/map keys). Call before [[applyUpserts]] when
    * mirroring the reference's snapshot connector contract. */
  def validateSnapshotKeys(df: DataFrame, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty,
      "snapshot mode requires a primary key (output_table_type=snapshot)")
    require(keyCols.distinct.size == keyCols.size,
      s"duplicate primary key columns: ${keyCols.mkString(", ")}")
    val fields = df.schema.fields.map(f => f.name -> f).toMap
    keyCols.foreach { k =>
      val f = fields.getOrElse(k,
        throw new IllegalArgumentException(s"primary key column $k missing"))
      require(!f.nullable, s"primary key column $k must not be nullable")
      require(!f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
        !f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] &&
        !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType],
        s"primary key column $k must be scalar, got ${f.dataType.simpleString}")
    }
  }
}
