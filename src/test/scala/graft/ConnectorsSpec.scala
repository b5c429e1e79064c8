package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Connectors
import java.nio.file.Files

/** File connector coverage (SURVEY §2.5): csv/jsonlines/plaintext/binary
  * roundtrips, metadata columns, streaming file source, Debezium envelope. */
class ConnectorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-conn").toString

  test("csv write/read roundtrip with schema") {
    val dir = tmpDir() + "/csv"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "x")
    Connectors.writeCsv(df, dir)
    val schema = new StructType().add("id", LongType).add("name", StringType).add("x", DoubleType)
    val back = Connectors.csv(spark, dir, schema = Some(schema))
    assert(back.as[(Long, String, Double)].collect().toSet == Set((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("jsonlines roundtrip and metadata columns") {
    val dir = tmpDir() + "/json"
    Connectors.writeJsonlines(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val back = Connectors.jsonlines(spark, dir, withMetadata = true)
    assert(back.select("id", "v").as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    val meta = back.select("_metadata_path", "_metadata_size").collect()
    assert(meta.forall(r => r.getString(0).startsWith("file:") && r.getLong(1) > 0))
  }

  test("plaintext reads one row per line; binaryFile one row per file") {
    val dir = tmpDir()
    Files.writeString(java.nio.file.Path.of(dir, "a.txt"), "line1\nline2\n")
    val lines = Connectors.plaintext(spark, dir + "/a.txt").as[String].collect().toSet
    assert(lines == Set("line1", "line2"))
    val files = Connectors.binaryByFile(spark, dir + "/a.txt")
    val row = files.select("data", "_metadata_size").head
    assert(new String(row.getAs[Array[Byte]](0)) == "line1\nline2\n" && row.getLong(1) == 12L)
  }

  test("streaming file source watches a directory (same path as static)") {
    val dir = tmpDir() + "/stream"
    new java.io.File(dir).mkdirs()
    Files.writeString(java.nio.file.Path.of(dir, "0.txt"), "x\ny\n")
    val stream = Connectors.plaintext(spark, dir, mode = Connectors.Streaming)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("file_stream_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("file_stream_out").as[String].collect().toSet == Set("x", "y"))
    q.stop()
  }

  test("debezium envelope → changelog diffs (c/u/d ops)") {
    val payload = new StructType().add("id", LongType).add("v", StringType)
    val msgs = Seq(
      """{"payload":{"before":null,"after":{"id":1,"v":"a"},"op":"c","ts_ms":100}}""",
      """{"payload":{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"b"},"op":"u","ts_ms":200}}""",
      """{"payload":{"before":{"id":2,"v":"x"},"after":null,"op":"d","ts_ms":300}}""").toDF("json")
    val cl = Connectors.debeziumToChangelog(msgs, col("json"), payload)
    val rows = cl.select("id", "v", "diff", "time").as[(Long, String, Int, Long)].collect().toSet
    assert(rows == Set(
      (1L, "a", 1, 100L),   // insert after-image
      (1L, "a", -1, 200L),  // update retracts before-image
      (1L, "b", 1, 200L),   // update inserts after-image
      (2L, "x", -1, 300L))) // delete retracts before-image
  }

  test("airbyte protocol: RECORD envelopes parse per stream, CDC maps to diffs") {
    val data = new StructType().add("id", LongType).add("v", StringType)
    val lines = Seq(
      """{"type":"LOG","log":{"level":"INFO","message":"starting"}}""",
      """{"type":"RECORD","record":{"stream":"users","emitted_at":100,"data":{"id":1,"v":"a"}}}""",
      """{"type":"RECORD","record":{"stream":"orders","emitted_at":110,"data":{"id":9,"v":"zz"}}}""",
      """{"type":"STATE","state":{"data":{"cursor":"110"}}}""",
      """{"type":"RECORD","record":{"stream":"users","emitted_at":120,"data":{"id":2,"v":"b"}}}""")
      .toDF("value")
    val users = Connectors.airbyteRecords(lines, "users", data)
      .select("id", "v", "_emitted_at").as[(Long, String, Long)].collect().toSet
    assert(users == Set((1L, "a", 100L), (2L, "b", 120L))) // orders/STATE/LOG filtered

    val cdcLines = Seq(
      """{"type":"RECORD","record":{"stream":"users","emitted_at":100,"data":{"id":1,"v":"a","_ab_cdc_deleted_at":null}}}""",
      """{"type":"RECORD","record":{"stream":"users","emitted_at":200,"data":{"id":1,"v":"a","_ab_cdc_deleted_at":"2024-01-01T00:00:00Z"}}}""")
      .toDF("value")
    val cl = Connectors.airbyteCdcToChangelog(cdcLines, "users", data)
      .select("id", "v", "diff", "time").as[(Long, String, Int, Long)].collect().toSet
    assert(cl == Set((1L, "a", 1, 100L), (1L, "a", -1, 200L)))

    // and the changelog snapshot resolves the deletion
    val snap = graft.streaming.StreamOps.streamToTable(
      Connectors.airbyteCdcToChangelog(cdcLines, "users", data), Seq("id"))
    assert(snap.count() == 0)
  }

  test("streaming wordcount maintains live counts across file arrivals (update mode)") {
    val dir = tmpDir() + "/wc"
    new java.io.File(dir).mkdirs()
    Files.writeString(java.nio.file.Path.of(dir, "0.txt"), "a b a\n")
    val lines = Connectors.plaintext(spark, dir, mode = Connectors.Streaming)
    val q = graft.examples.WordCount.counts(lines)
      .writeStream.outputMode("complete").format("memory").queryName("wc_out").start()
    q.processAllAvailable()
    assert(spark.table("wc_out").as[(String, Long)].collect().toMap == Map("a" -> 2L, "b" -> 1L))
    Files.writeString(java.nio.file.Path.of(dir, "1.txt"), "b c\n")
    q.processAllAvailable()
    assert(spark.table("wc_out").as[(String, Long)].collect().toMap ==
      Map("a" -> 2L, "b" -> 2L, "c" -> 1L)) // counts updated incrementally
    q.stop()
  }

  test("test_backpressure_management_respects_atomicity: maxBacklogFiles " +
      "throttles BETWEEN files; a file's lines never split across batches") {
    val dir = tmpDir() + "/bp"
    new java.io.File(dir).mkdirs()
    Files.writeString(java.nio.file.Path.of(dir, "input_1.txt"),
      ('a' to 'j').mkString("\n"))
    Files.writeString(java.nio.file.Path.of(dir, "input_2.txt"),
      ('k' to 't').mkString("\n"))
    val lines = Connectors.plaintext(spark, dir, mode = Connectors.Streaming,
      maxBacklogFiles = Some(1))
    val batchOf = scala.collection.mutable.Map[String, Long]()
    val q = lines.writeStream.foreachBatch {
      (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.collect().foreach(r => batchOf.synchronized {
          batchOf(r.getString(0)) = id
        })
    }.start()
    q.processAllAvailable(); q.stop()
    assert(batchOf.size == 20, s"all 20 lines delivered: ${batchOf.size}")
    // each file is an atomic unit: all its lines share ONE batch id, and
    // the two files landed in different batches (the throttle interrupted
    // between them, never inside one)
    val b1 = ('a' to 'j').map(c => batchOf(c.toString)).toSet
    val b2 = ('k' to 't').map(c => batchOf(c.toString)).toSet
    assert(b1.size == 1 && b2.size == 1, s"file split across batches: $b1 $b2")
    assert(b1 != b2, "maxBacklogFiles=1 must separate the two files")
  }

  test("rate demo stream produces increasing values") {
    val df = graft.streaming.StreamOps.rateStream(spark, 10)
    assert(df.isStreaming && df.columns.contains("value"))
  }

  test("object_pattern filters the directory listing before any file opens " +
      "(r17 decode of test_io.py test_objects_pattern)") {
    val dir = tmpDir()
    Files.write(java.nio.file.Paths.get(dir, "input.txt"), "a\nb\nc".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "input.dat"), "d\ne\nf\ng".getBytes)
    val txt = Connectors.plaintext(spark, dir, objectPattern = Some("*.txt"))
      .collect().map(_.getString(0)).toSet
    assert(txt == Set("a", "b", "c"))
    val dat = Connectors.plaintext(spark, dir, objectPattern = Some("*.dat"))
      .collect().map(_.getString(0)).toSet
    assert(dat == Set("d", "e", "f", "g"))
  }

  test("object_pattern on a nonexistent directory still yields the empty " +
      "table, not PATH_NOT_FOUND (r17 review pin)") {
    val out = Connectors.plaintext(spark, "/no/such/graft/dir",
      objectPattern = Some("*.txt"))
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq == Seq("data"))
  }

  test("object_pattern filters csv and jsonlines directory reads too " +
      "(io.fs.read object_pattern applies to every format)") {
    val dir = tmpDir()
    Files.write(java.nio.file.Paths.get(dir, "a.csv"), "v\n1\n2".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "b.dat"), "v\n9".getBytes)
    val got = Connectors.csv(spark, dir, objectPattern = Some("*.csv"))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("1", "2"))
    Files.write(java.nio.file.Paths.get(dir, "c.jsonl"), """{"x": 5}""".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "d.txt"), """{"x": 6}""".getBytes)
    val js = Connectors.jsonlines(spark, dir, objectPattern = Some("*.jsonl"))
      .select("x").collect().map(_.getLong(0)).toSet
    assert(js == Set(5L))
  }
}
