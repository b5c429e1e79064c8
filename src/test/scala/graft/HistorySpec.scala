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
}
