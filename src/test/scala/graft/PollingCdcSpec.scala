package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PollingCdc

/** Replays the reference's SQLite polling-CDC vectors
  * (tests/test_sqlite.py:26 `test_sqlite`) on embedded Derby — the portable
  * semantics of data_storage/sqlite.rs: per poll, a keyed snapshot diff
  * emitting +1 for appearances, −1 for disappearances, and −1/+1 pairs for
  * in-place updates. */
class PollingCdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val dbDir = java.nio.file.Files.createTempDirectory("graft-cdc-derby").toString
  private val url = s"jdbc:derby:$dbDir/db;create=true"

  private def sql(stmts: String*): Unit = {
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    try stmts.foreach { s => val st = conn.createStatement(); st.execute(s); st.close() }
    finally conn.close()
  }

  private def events(df: org.apache.spark.sql.DataFrame): Seq[(String, Int)] =
    df.select(col("NAME"), col("diff")).collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq.sortBy(e => (e._1, e._2))

  test("test_sqlite replay: insert, update (−1/+1 pair), delete across four polls") {
    sql(
      "CREATE TABLE users (id INT, login VARCHAR(64), name VARCHAR(64))",
      "INSERT INTO users VALUES (1, 'alice', 'Alice')",
      "INSERT INTO users VALUES (2, 'bob1999', 'Bob')")
    val stateDir = java.nio.file.Files.createTempDirectory("graft-cdc-state").toString

    val p1 = events(PollingCdc.jdbcPollStep(spark, url, "users", Seq("ID"), stateDir))
    assert(p1 == Seq(("Alice", 1), ("Bob", 1)))

    sql("INSERT INTO users VALUES (3, 'ch123', 'Charlie')")
    val p2 = events(PollingCdc.jdbcPollStep(spark, url, "users", Seq("ID"), stateDir))
    assert(p2 == Seq(("Charlie", 1)))

    sql("UPDATE users SET name = 'Bob Smith' WHERE id = 2")
    val p3 = events(PollingCdc.jdbcPollStep(spark, url, "users", Seq("ID"), stateDir))
    assert(p3 == Seq(("Bob", -1), ("Bob Smith", 1)))

    sql("DELETE FROM users WHERE id = 3")
    val p4 = events(PollingCdc.jdbcPollStep(spark, url, "users", Seq("ID"), stateDir))
    assert(p4 == Seq(("Charlie", -1)))

    // cumulative log matches the reference's asserted event list
    val all = (p1 ++ p2 ++ p3 ++ p4).groupBy(identity).view.mapValues(_.size).toMap
    assert(all == Map(("Alice", 1) -> 1, ("Bob", 1) -> 1, ("Charlie", 1) -> 1,
      ("Bob", -1) -> 1, ("Bob Smith", 1) -> 1, ("Charlie", -1) -> 1))
  }

  test("an unchanged poll emits nothing; key-only tables diff on presence") {
    sql("CREATE TABLE tags (tag VARCHAR(16) NOT NULL PRIMARY KEY)",
      "INSERT INTO tags VALUES ('a')", "INSERT INTO tags VALUES ('b')")
    val stateDir = java.nio.file.Files.createTempDirectory("graft-cdc-state2").toString
    val p1 = PollingCdc.jdbcPollStep(spark, url, "tags", Seq("TAG"), stateDir)
    assert(p1.count() == 2)
    val p2 = PollingCdc.jdbcPollStep(spark, url, "tags", Seq("TAG"), stateDir)
    assert(p2.count() == 0)
    sql("DELETE FROM tags WHERE tag = 'a'")
    val p3 = PollingCdc.jdbcPollStep(spark, url, "tags", Seq("TAG"), stateDir)
    assert(p3.collect().map(r => (r.getString(0), r.getInt(1))).toSeq == Seq(("a", -1)))
  }

  test("fs replacement vectors: overwrite retracts+inserts, removal retracts (test_io.py:1370-1601)") {
    import graft.core.{PwColumnDef, PwSchema}
    import org.apache.spark.sql.types._
    val schema = PwSchema(Seq(
      PwColumnDef("key", LongType, primaryKey = true),
      PwColumnDef("value", StringType)))
    def events(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Int)] =
      df.select("key", "value", "diff").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq.sortBy(identity)

    // test_simple_replacement_with_removal: two files, then one removed
    val dir1 = java.nio.file.Files.createTempDirectory("graft-fs-cdc").toString
    val st1 = java.nio.file.Files.createTempDirectory("graft-fs-state").toString
    def poll1() = events(PollingCdc.fsJsonlinesPollStep(spark, dir1, schema, Seq("key"), st1))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir1, "input1.jsonlines"),
      """{"key": 1, "value": "one"}""".getBytes)
    assert(poll1() == Seq((1L, "one", 1)))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir1, "input2.jsonlines"),
      """{"key": 20, "value": "twenty"}""".getBytes)
    assert(poll1() == Seq((20L, "twenty", 1)))
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir1, "input1.jsonlines"))
    assert(poll1() == Seq((1L, "one", -1)))

    // test_simple_insert_consolidation: the SAME file overwritten back and forth
    val dir2 = java.nio.file.Files.createTempDirectory("graft-fs-cdc2").toString
    val st2 = java.nio.file.Files.createTempDirectory("graft-fs-state2").toString
    def poll2() = events(PollingCdc.fsJsonlinesPollStep(spark, dir2, schema, Seq("key"), st2))
    val f2 = java.nio.file.Paths.get(dir2, "input1.jsonlines")
    java.nio.file.Files.write(f2, """{"key": 1, "value": "one"}""".getBytes)
    assert(poll2() == Seq((1L, "one", 1)))
    java.nio.file.Files.write(f2, """{"key": 20, "value": "twenty"}""".getBytes)
    assert(poll2() == Seq((1L, "one", -1), (20L, "twenty", 1)))
    java.nio.file.Files.write(f2, """{"key": 1, "value": "one"}""".getBytes)
    assert(poll2() == Seq((1L, "one", 1), (20L, "twenty", -1)))

    // test_simple_replacement_on_file: a single-file path that vanishes and returns
    val dir3 = java.nio.file.Files.createTempDirectory("graft-fs-cdc3").toString
    val st3 = java.nio.file.Files.createTempDirectory("graft-fs-state3").toString
    val f3 = java.nio.file.Paths.get(dir3, "input.jsonlines")
    def poll3() = events(PollingCdc.fsJsonlinesPollStep(
      spark, f3.toString, schema, Seq("key"), st3))
    java.nio.file.Files.write(f3, """{"key": 1, "value": "one"}""".getBytes)
    assert(poll3() == Seq((1L, "one", 1)))
    java.nio.file.Files.write(f3, """{"key": 20, "value": "twenty"}""".getBytes)
    assert(poll3() == Seq((1L, "one", -1), (20L, "twenty", 1)))
    java.nio.file.Files.delete(f3)
    assert(poll3() == Seq((20L, "twenty", -1)))
    java.nio.file.Files.write(f3, """{"key": 3, "value": "three"}""".getBytes)
    assert(poll3() == Seq((3L, "three", 1)))
  }

  test("test_id_hashing_across_connectors: csv and jsonlines yield identical keyed ids") {
    import graft.core.{PwColumnDef, PwSchema}
    import graft.sources.Connectors
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-idhash")
    java.nio.file.Files.write(dir.resolve("input.csv"),
      "key,value\n1,foo\n2,bar\n3,baz".getBytes)
    java.nio.file.Files.write(dir.resolve("input.json"),
      Seq("""{"key": 1, "value": "foo"}""", """{"key": 2, "value": "bar"}""",
        """{"key": 3, "value": "baz"}""").mkString("\n").getBytes)
    val schema = PwSchema(Seq(
      PwColumnDef("key", LongType, primaryKey = true),
      PwColumnDef("value", StringType)))
    val fromCsv = schema.keyed(
      Connectors.csvTyped(spark, dir.resolve("input.csv").toString, schema)
        .drop(graft.functions.Errors.ErrCol))
    val fromJson = schema.keyed(
      Connectors.jsonlinesTyped(spark, dir.resolve("input.json").toString, schema)
        .drop(graft.functions.Errors.ErrCol))
    val a = fromCsv.df.select("_pw_id", "key", "value").collect().map(_.toSeq).toSet
    val b = fromJson.df.select("_pw_id", "key", "value").collect().map(_.toSeq).toSet
    assert(a == b && a.size == 3)
  }

  test("snapshotDiff handles null values null-safely (no spurious update pairs)") {
    import spark.implicits._
    val prev = Seq((1, Option.empty[String]), (2, Some("x"))).toDF("k", "v")
    val curr = Seq((1, Option.empty[String]), (2, Some("y"))).toDF("k", "v")
    val out = PollingCdc.snapshotDiff(prev, curr, Seq("k"))
      .collect().map(r => (r.getInt(0), Option(r.getString(1)), r.getInt(2))).toSet
    assert(out == Set((2, Some("x"), -1), (2, Some("y"), 1)))
  }
  test("only_metadata format: one metadata row per file, rewrite = retract+insert (test_fs_metadata_only)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-meta-cdc").toString
    val st = java.nio.file.Files.createTempDirectory("graft-meta-state").toString
    def poll() = PollingCdc.fsMetadataPollStep(spark, dir, st)
      .select("_metadata_path", "diff").collect()
      .map(r => (new java.io.File(r.getString(0)).getName, r.getInt(1))).toSeq.sorted
    val f = java.nio.file.Paths.get(dir, "a.txt")
    java.nio.file.Files.write(f, "aaaa".getBytes)
    assert(poll() == Seq(("a.txt", 1)))
    // unchanged poll: nothing
    assert(poll().isEmpty)
    // rewrite with different content/size -> retract old metadata + insert new
    java.nio.file.Files.write(f, "bbbbbbbb".getBytes)
    assert(poll() == Seq(("a.txt", -1), ("a.txt", 1)))
    // removal retracts; rows carry ONLY metadata columns + diff
    java.nio.file.Files.delete(f)
    val last = PollingCdc.fsMetadataPollStep(spark, dir, st)
    assert(last.columns.toSet ==
      Set("_metadata_path", "_metadata_size", "_metadata_modified_at", "diff"))
    assert(last.count() == 1 && last.select("diff").collect().head.getInt(0) == -1)
  }

  test("pollingStream drives live polls: changes between triggers surface as changelog batches") {
    import graft.core.{PwColumnDef, PwSchema}
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-live-cdc").toString
    val st = java.nio.file.Files.createTempDirectory("graft-live-state").toString
    val schema = PwSchema(Seq(
      PwColumnDef("key", LongType, primaryKey = true),
      PwColumnDef("value", StringType)))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int)]()
    val f = java.nio.file.Paths.get(dir, "d.jsonlines")
    java.nio.file.Files.write(f, """{"key": 1, "value": "one"}""".getBytes)
    val q = PollingCdc.pollingStream(spark, intervalMs = 300,
      () => PollingCdc.fsJsonlinesPollStep(spark, dir, schema, Seq("key"), st)) { diff =>
      diff.select("key", "value", "diff").collect()
        .foreach(r => seen.add((r.getLong(0), r.getString(1), r.getInt(2))))
    }
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (seen.size < 1 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(seen.size >= 1, "first poll never surfaced")
      java.nio.file.Files.write(f, """{"key": 1, "value": "uno"}""".getBytes)
      while (seen.size < 3 && System.currentTimeMillis() < deadline) Thread.sleep(100)
    } finally q.stop()
    val events = seen.toArray(Array.empty[(Long, String, Int)]).toSeq
    assert(events.contains((1L, "one", 1)))
    assert(events.contains((1L, "one", -1)) && events.contains((1L, "uno", 1)),
      s"update never surfaced: $events")
  }

}
