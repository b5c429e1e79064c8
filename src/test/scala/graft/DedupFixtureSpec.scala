package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps

/** Replays of the reference's deduplicate-persistence fixtures
  * (tests/test_deduplicate.py, r16 decode): the acceptor's last-accepted
  * state survives restarts, per instance, and even across an acceptor CODE
  * change — the reference persists state keyed by operator name and replays
  * inputs (old rows then fall out naturally because `acceptor(old, state)`
  * rejects them); Spark persists the same state in the checkpoint and skips
  * already-committed offsets instead. Both roads give the same accepted
  * sequence, which is what these replays pin. Delivery shape differs as
  * documented (SEMANTICS.md D4): the reference emits retract+insert pairs on
  * one row id, we emit the accepted values as an append stream. */
class DedupFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** dedup over "instance,val" lines in `inDir`, checkpointed at `ckpt`,
    * appended to the parquet dir `out` (the memory sink cannot recover from
    * a checkpoint; a real sink can — that recovery IS what these fixtures
    * pin). Each run's rows are tagged so per-run assertions stay possible. */
  private def runOnce(inDir: String, ckpt: String, out: String, run: Int,
      acceptor: (Long, Long) => Boolean): Unit = {
    val ds = spark.readStream.option("maxFilesPerTrigger", "1").text(inDir)
      .select(split(col("value"), ",").as("p"))
      .select(col("p")(0).cast("long").as("i"), col("p")(1).cast("long").as("v"))
      .as[(Long, Long)]
    val q = ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        StreamOps.dedupAcceptor[Long, Long](acceptor))
      .toDF("instance", "val").withColumn("run", lit(run))
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()
  }

  /** Accepted (instance, val) rows of one run, in acceptance order — accepted
    * values are strictly increasing per instance, so value order is
    * acceptance order. */
  private def accepted(out: String, run: Int): Seq[(Long, Long)] =
    spark.read.parquet(out).filter(col("run") === run)
      .orderBy("val").select("instance", "val")
      .as[(Long, Long)].collect().toSeq

  /** One "micro-batch" file. The file source orders same-mtime files
    * arbitrarily, so each file gets an explicit increasing lastModified
    * derived from its name — arrival order IS the reference's __time__
    * order. */
  private def write(dir: String, file: String, rows: (Long, Long)*): Unit = {
    val p = java.nio.file.Path.of(dir, file)
    java.nio.file.Files.writeString(p,
      rows.map { case (i, v) => s"$i,$v" }.mkString("", "\n", "\n"))
    val seq = file.takeWhile(_.isDigit).toLong
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(1_700_000_000_000L + seq * 60_000L))
  }

  test("deduplicate keeps state across a restart (test_deduplicate_keeps_state)") {
    val base = java.nio.file.Files.createTempDirectory("graft-dedupfix1").toString
    val inDir = base + "/in"; val ckpt = base + "/ckpt"
    new java.io.File(inDir).mkdirs()
    // data_1 in time order; the time-16 batch [8, 9, 10] lands in ONE file so
    // the intra-batch row-order rule (8 rejected, 9 accepted, 10 rejected
    // against the fresh 9) is exercised
    write(inDir, "00.txt", (1L, 1L)); write(inDir, "01.txt", (1L, 2L))
    write(inDir, "02.txt", (1L, 3L)); write(inDir, "03.txt", (1L, 4L))
    write(inDir, "04.txt", (1L, 5L)); write(inDir, "05.txt", (1L, 6L))
    write(inDir, "06.txt", (1L, 7L))
    write(inDir, "07.txt", (1L, 8L), (1L, 9L), (1L, 10L))
    write(inDir, "08.txt", (1L, 12L)); write(inDir, "09.txt", (1L, 13L))
    def acc(n: Long, o: Long): Boolean = n >= o + 2
    val out = base + "/out"
    runOnce(inDir, ckpt, out, 1, acc)
    assert(accepted(out, 1).map(_._2) == Seq(1L, 3L, 5L, 7L, 9L, 12L))
    // restart with more data: state resumes from 12 (14 accepted, 15 not, …)
    write(inDir, "10.txt", (1L, 14L)); write(inDir, "11.txt", (1L, 15L))
    write(inDir, "12.txt", (1L, 16L)); write(inDir, "13.txt", (1L, 17L))
    write(inDir, "14.txt", (1L, 18L))
    runOnce(inDir, ckpt, out, 2, acc)
    assert(accepted(out, 2).map(_._2) == Seq(14L, 16L, 18L))
    // and a SECOND restart (test_deduplicate_keeps_state_after_two_restarts)
    write(inDir, "15.txt", (1L, 19L)); write(inDir, "16.txt", (1L, 21L))
    runOnce(inDir, ckpt, out, 3, acc)
    assert(accepted(out, 3).map(_._2) == Seq(21L)) // 19 < 18+2 rejected; 21 ≥ 20 accepted
  }

  test("deduplicate keeps PER-INSTANCE state across a restart (test_deduplicate_with_instance_keeps_state)") {
    val base = java.nio.file.Files.createTempDirectory("graft-dedupfix2").toString
    val inDir = base + "/in"; val ckpt = base + "/ckpt"
    new java.io.File(inDir).mkdirs()
    def acc(n: Long, o: Long): Boolean = n >= o + 3
    write(inDir, "00.txt", (1L, 1L)); write(inDir, "01.txt", (2L, 2L))
    write(inDir, "02.txt", (1L, 3L))
    write(inDir, "03.txt", (1L, 4L), (1L, 5L)) // one batch: 4 accepted, 5 not
    write(inDir, "04.txt", (2L, 6L)); write(inDir, "05.txt", (1L, 6L))
    val out = base + "/out"
    runOnce(inDir, ckpt, out, 1, acc)
    assert(accepted(out, 1).toSet == Set((1L, 1L), (2L, 2L), (1L, 4L), (2L, 6L)))
    write(inDir, "06.txt", (1L, 20L)); write(inDir, "07.txt", (2L, 13L))
    write(inDir, "08.txt", (1L, 18L)); write(inDir, "09.txt", (1L, 24L))
    runOnce(inDir, ckpt, out, 2, acc)
    // instance 1 resumes at 4 → 20 then 24 (18 < 23 rejected); instance 2 at 6 → 13
    assert(accepted(out, 2).toSet == Set((1L, 20L), (2L, 13L), (1L, 24L)))
  }

  test("state survives an acceptor CODE change (test_deduplicate_keeps_state_after_code_change)") {
    val base = java.nio.file.Files.createTempDirectory("graft-dedupfix3").toString
    val inDir = base + "/in"; val ckpt = base + "/ckpt"
    new java.io.File(inDir).mkdirs()
    write(inDir, "00.txt", (1L, 1L)); write(inDir, "01.txt", (1L, 2L))
    write(inDir, "02.txt", (1L, 3L)); write(inDir, "03.txt", (1L, 4L))
    val out = base + "/out"
    runOnce(inDir, ckpt, out, 1, (n, o) => n >= o + 2)
    assert(accepted(out, 1).map(_._2) == Seq(1L, 3L))
    // restart with offset 4 instead of 2: persisted state (3) + NEW code
    write(inDir, "04.txt", (1L, 5L)); write(inDir, "05.txt", (1L, 6L))
    write(inDir, "06.txt", (1L, 7L)); write(inDir, "07.txt", (1L, 8L))
    runOnce(inDir, ckpt, out, 2, (n, o) => n >= o + 4)
    assert(accepted(out, 2).map(_._2) == Seq(7L))
  }
}
