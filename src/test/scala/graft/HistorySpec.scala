package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.History

/** Time-travel replay: per-batch changelog store reconstructs any prior
  * keyed state and replays the diff stream between versions. */
class HistorySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("asOf reconstructs keyed state at each recorded batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-history").toString
    // batch 0: ann=1, bob=2 inserted
    History.append(Seq(("ann", 1.0, 10L, 1), ("bob", 2.0, 10L, 1))
      .toDF("user", "value", "time", "diff"), dir, 0L)
    // batch 1: ann updated to 1.5 (retract + insert at t=20)
    History.append(Seq(("ann", 1.0, 20L, -1), ("ann", 1.5, 20L, 1))
      .toDF("user", "value", "time", "diff"), dir, 1L)
    // batch 2: bob deleted
    History.append(Seq(("bob", 2.0, 30L, -1))
      .toDF("user", "value", "time", "diff"), dir, 2L)

    assert(History.versions(spark, dir) == Seq(0L, 1L, 2L))
    def state(upTo: Long) =
      History.asOf(spark, dir, upTo, Seq("user")).select("user", "value")
        .as[(String, Double)].collect().toSet
    assert(state(0L) == Set(("ann", 1.0), ("bob", 2.0)))
    assert(state(1L) == Set(("ann", 1.5), ("bob", 2.0)))
    assert(state(2L) == Set(("ann", 1.5)))

    val diffs = History.between(spark, dir, 0L, 2L)
      .select("user", "diff").as[(String, Int)].collect()
    assert(diffs.length == 3)
  }

  test("test_replay / test_replay_timestamps: SPEEDRUN preserves the " +
      "recorded batch boundaries, BATCH collapses to one") {
    val dir = java.nio.file.Files.createTempDirectory("graft-replaymode").toString
    // record 3 batches of 15 generated rows (5 per commit)
    (0L until 3L).foreach { b =>
      History.append((0L until 5L).map(i => (b * 5 + i, 2 * (b * 5 + i) + 1))
        .toDF("x", "number"), dir, b)
    }
    // SPEEDRUN: same number of distinct "timestamps" (batches) as recorded,
    // same contents per batch, in recorded order
    val speedrun = History.replaySpeedrun(spark, dir)
    assert(speedrun.map(_._1) == Seq(0L, 1L, 2L), "recorded batch ids, in order")
    val perBatch = speedrun.map { case (_, df) =>
      df.select("number").as[Long].collect().toSet }
    assert(perBatch == Seq.tabulate(3)(b =>
      (0L until 5L).map(i => 2 * (b * 5 + i) + 1).toSet))
    // BATCH: ONE batch carrying the whole snapshot
    val batch = History.replayBatch(spark, dir).select("number").as[Long].collect()
    assert(batch.length == 15 && batch.toSet == perBatch.flatten.toSet)
  }
}
