package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.JdbcSink

/** Integration test of the JDBC upsert sink against embedded Derby (a real
  * database file, the JDBC engine shipped with Spark): inserts, updates and
  * deletes from changelog diffs. */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dbDir = java.nio.file.Files.createTempDirectory("graft-derby").toString
  private val url = s"jdbc:derby:$dbDir/db;create=true"

  private def query(sql: String): Seq[(Long, String, Double)] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
      while (rs.next()) buf += ((rs.getLong(1), rs.getString(2), rs.getDouble(3)))
      buf.toSeq
    } finally conn.close()
  }

  test("applyUpserts applies insert/update/delete diffs to a real database") {
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE users (user_id BIGINT PRIMARY KEY, name VARCHAR(32), score DOUBLE)")
    conn.close()

    // batch 1: three inserts
    JdbcSink.applyUpserts(
      Seq((1L, "ann", 1.0, 1), (2L, "bob", 2.0, 1), (3L, "cat", 3.0, 1))
        .toDF("user_id", "name", "score", "diff"),
      Seq("user_id"), url, "users", diffCol = Some("diff"))
    assert(query("SELECT user_id, name, score FROM users ORDER BY user_id") ==
      Seq((1L, "ann", 1.0), (2L, "bob", 2.0), (3L, "cat", 3.0)))

    // batch 2: update key 2, delete key 3, insert key 4
    JdbcSink.applyUpserts(
      Seq((2L, "bobby", 2.5, 1), (3L, "cat", 3.0, -1), (4L, "dee", 4.0, 1))
        .toDF("user_id", "name", "score", "diff"),
      Seq("user_id"), url, "users", diffCol = Some("diff"))
    assert(query("SELECT user_id, name, score FROM users ORDER BY user_id") ==
      Seq((1L, "ann", 1.0), (2L, "bobby", 2.5), (4L, "dee", 4.0)))

    // batch 3: no diff column → pure upsert semantics
    JdbcSink.applyUpserts(
      Seq((1L, "ann2", 1.5), (5L, "eve", 5.0)).toDF("user_id", "name", "score"),
      Seq("user_id"), url, "users")
    assert(query("SELECT user_id, name, score FROM users ORDER BY user_id") ==
      Seq((1L, "ann2", 1.5), (2L, "bobby", 2.5), (4L, "dee", 4.0), (5L, "eve", 5.0)))

    // read side: spark.read.jdbc round-trips the final state, single and
    // partitioned scans agree
    val read = graft.sources.Connectors.jdbc(spark, url, "users")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(read == Seq((1L, "ann2", 1.5), (2L, "bobby", 2.5), (4L, "dee", 4.0), (5L, "eve", 5.0)))
    val readPart = graft.sources.Connectors.jdbc(spark, url, "users",
        Some(("user_id", 0L, 10L, 3)))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(readPart == read)
  }

  test("kill-and-recover: restart from checkpoint loses nothing, duplicates nothing") {
    // The reference's wordcount integration matrix restarts the computation
    // mid-stream (integration_tests/wordcount, test_new_data.py:22) and
    // requires the output to end exactly correct. Same protocol: streaming
    // count → changelog upsert into Derby, stop the query mid-corpus, more
    // data arrives while down, restart from the SAME checkpoint + source,
    // drain, and the table must equal the exact closed-form counts — replayed
    // microbatches re-upsert the same keys (idempotent), so a crash between
    // sink write and offset commit cannot double-count.
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE recov (k BIGINT PRIMARY KEY, cnt BIGINT)")
    conn.close()
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val ck = java.nio.file.Files.createTempDirectory("graft-recov-ck").toString
    def startQ() = JdbcSink.upsertWriter(
        ms.toDS().select((col("value") % 10).as("k")).groupBy("k")
          .agg(count(lit(1)).as("cnt")),
        Seq("k"), url, "recov")
      .outputMode("update")
      .option("checkpointLocation", ck).start()
    val q1 = startQ()
    ms.addData(0L until 500L)
    q1.processAllAvailable()
    q1.stop() // the kill
    ms.addData(500L until 700L) // arrives while the query is down
    val q2 = startQ()
    q2.processAllAvailable()
    q2.stop()
    val got = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery("SELECT k, cnt FROM recov ORDER BY k")
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        while (rs.next()) buf += ((rs.getLong(1), rs.getLong(2)))
        buf.toSeq
      } finally c.close()
    }
    assert(got == (0L until 10L).map(k => (k, 70L)),
      s"700 rows over 10 keys must count exactly 70 each after recovery, got $got")
  }
  test("stream_of_changes mode: events APPEND with time/diff, deletions recorded not applied") {
    import graft.streaming.JdbcSink
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    locally {
      val c = java.sql.DriverManager.getConnection(url)
      try c.createStatement().execute(
        "CREATE TABLE soc_out (k BIGINT, v VARCHAR(32), time BIGINT, diff INT)")
      finally c.close()
    }
    val b1 = Seq((1L, "one", 10L, 1), (2L, "two", 10L, 1)).toDF("k", "v", "time", "diff")
    JdbcSink.appendChangelog(b1, url, "soc_out")
    // a deletion event is a NEW ROW with diff=-1 (test_stream_of_changes_records_deletions)
    val b2 = Seq((1L, "one", 20L, -1)).toDF("k", "v", "time", "diff")
    JdbcSink.appendChangelog(b2, url, "soc_out")
    val conn = java.sql.DriverManager.getConnection(url)
    val rs = conn.createStatement().executeQuery(
      "SELECT k, diff FROM soc_out ORDER BY time, k")
    val rows = Iterator.continually(rs).takeWhile(_.next())
      .map(r => (r.getLong(1), r.getInt(2))).toList
    conn.close()
    assert(rows == List((1L, 1), (2L, 1), (1L, -1)))
    // reserved-name collision: payload may not carry its own time/diff
    val bad = Seq((1L, 5, 10L, 1)).toDF("k", "time", "time2", "diff")
      .withColumnRenamed("time2", "time")
    intercept[IllegalArgumentException] {
      JdbcSink.appendChangelog(bad, url, "soc_out")
    }
  }

  test("snapshot-mode key validation: pk required, distinct, non-nullable, scalar") {
    import graft.streaming.JdbcSink
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("nk", LongType, nullable = true),
        StructField("arr", ArrayType(LongType), nullable = false),
        StructField("v", StringType))))
    JdbcSink.validateSnapshotKeys(df, Seq("k")) // fine
    intercept[IllegalArgumentException] { JdbcSink.validateSnapshotKeys(df, Nil) }
    intercept[IllegalArgumentException] { JdbcSink.validateSnapshotKeys(df, Seq("k", "k")) }
    intercept[IllegalArgumentException] { JdbcSink.validateSnapshotKeys(df, Seq("nk")) }
    intercept[IllegalArgumentException] { JdbcSink.validateSnapshotKeys(df, Seq("arr")) }
    intercept[IllegalArgumentException] { JdbcSink.validateSnapshotKeys(df, Seq("zz")) }
  }

  test("test_output_rejects_nonpositive_max_batch_size: the flush threshold " +
      "is validated centrally with the reference's message") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    Seq(0, -5).foreach { bad =>
      val e = intercept[IllegalArgumentException] {
        JdbcSink.applyUpserts(df, Seq("k"), "jdbc:derby:memory:nosuch;create=true",
          "t", jdbcBatchSize = bad)
      }
      assert(e.getMessage.contains("max_batch_size must be a positive integer"),
        e.getMessage)
    }
  }

}
