package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Test-only sinks. Lives in test scope so nothing driver-collecting can
  * ship in the library jar — the production upsert path is
  * [[graft.streaming.JdbcSink]] (foreachPartition, batched statements,
  * Derby-integration-tested). */
object TestSinks {

  /** Per-microbatch merge into an in-memory TrieMap so streaming specs can
    * assert sink state without a database. Collects each batch to the
    * driver — acceptable only under test data volumes. */
  def upsertSink(df: DataFrame, keyCols: Seq[String]):
      (scala.collection.concurrent.Map[Seq[Any], Seq[Any]], DataStreamWriter[Row]) = {
    val table = scala.collection.concurrent.TrieMap.empty[Seq[Any], Seq[Any]]
    val writer = df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val cols = batch.columns
      val kIdx = keyCols.map(cols.indexOf(_))
      batch.collect().foreach { row =>
        val k = kIdx.map(row.get)
        table.put(k, row.toSeq)
      }
      ()
    }
    (table, writer)
  }
}
