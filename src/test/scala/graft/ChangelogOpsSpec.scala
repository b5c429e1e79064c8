package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ChangelogOps

/** Retraction algebra: diff-weighted aggregates, live multiset, and the
  * bilinear join rule (diff = diff_l · diff_r). */
class ChangelogOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // key a: insert 5, insert 7, retract 5 → live {7}; key b: insert 3, retract 3 → dead
  private def cl = Seq(
    ("a", 5.0, 1), ("a", 7.0, 1), ("a", 5.0, -1),
    ("b", 3.0, 1), ("b", 3.0, -1)).toDF("k", "v", "diff")

  test("netAggregate drops fully-retracted keys and nets the linear reducers") {
    val out = ChangelogOps.netAggregate(cl, Seq("k"), col("v"), col("diff"))
      .select("k", "net_count", "net_sum").as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map("a" -> ((1L, 7.0))))
  }

  test("upsert session expansion replays test_python_connector_upsert_raw: 5 events, final {three}") {
    import graft.streaming.StreamOps
    // add(one), remove, add(two), add(three) on ONE key (test_io.py:2424)
    val events = Seq(
      (0L, 1L, "add", "one"), (0L, 2L, "remove", ""),
      (0L, 3L, "add", "two"), (0L, 4L, "add", "three"))
      .toDF("k", "time", "op", "v")
    val out = StreamOps.upsertSessionToChangelog(events, Seq("k"))
      .select("v", "diff").as[(String, Int)].collect().toSeq
    assert(out.length == 5) // the fixture's len(result) == 5
    assert(out.sorted == Seq(("one", -1), ("one", 1), ("three", 1),
      ("two", -1), ("two", 1)).sorted)
    // net state = {three}
    val net = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).filter(_._2 > 0).keys.toSet
    assert(net == Set("three"))

    // removal is BY KEY - the remove's own payload is ignored (test_io.py:2473)
    val rm = Seq((0L, 1L, "add", "one"), (0L, 2L, "remove", "IGNORED"))
      .toDF("k", "time", "op", "v")
    val out2 = StreamOps.upsertSessionToChangelog(rm, Seq("k"))
      .select("v", "diff").as[(String, Int)].collect().toSeq
    assert(out2.length == 2 && out2.toSet == Set(("one", 1), ("one", -1)))

    // remove of an absent key emits nothing
    val rm2 = Seq((0L, 1L, "remove", "x")).toDF("k", "time", "op", "v")
    assert(StreamOps.upsertSessionToChangelog(rm2, Seq("k")).count() == 0)
  }

  test("liveMinMax ignores retracted values (retract-then-reinsert safe)") {
    val out = ChangelogOps.liveMinMax(cl, Seq("k"), col("v"), col("diff"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map("a" -> ((7.0, 7.0))))
    // reinsert 5 for a: min comes back
    val cl2 = cl.unionByName(Seq(("a", 5.0, 1)).toDF("k", "v", "diff"))
    val out2 = ChangelogOps.liveMinMax(cl2, Seq("k"), col("v"), col("diff"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out2 == Map("a" -> ((5.0, 7.0))))
  }

  test("joinChangelogs follows the bilinear diff rule; live view matches joined snapshots") {
    val l = Seq(("a", "l1", 1), ("a", "l1", -1), ("a", "l2", 1)).toDF("k", "lv", "ld")
    val r = Seq(("a", "r1", 1)).toDF("k", "rv", "rd")
    val joined = ChangelogOps.joinChangelogs(l, r, Seq("k"), col("ld"), col("rd"))
    // live rows of the joined changelog == join of the live sides
    val live = ChangelogOps.liveRows(joined, Seq("k", "lv", "rv"), col("diff"))
      .select("lv", "rv").as[(String, String)].collect().toSet
    assert(live == Set(("l2", "r1")))
    // and the retracted pair netted out to zero
    assert(joined.filter(col("lv") === "l1").agg(sum("diff")).head.getLong(0) == 0L)
  }

  // test_common.py test_remove_retractions: the source nets to {1,4} but the
  // de-retracted view accumulates every inserted value, and its stream is
  // exactly the diff=+1 slice at the original times
  test("removeRetractions replays test_remove_retractions") {
    val t = Seq((1, 2, 1), (2, 4, 1), (3, 6, 1), (2, 8, -1), (4, 10, 1),
      (3, 12, -1)).toDF("a", "time", "diff")
    val res = graft.streaming.StreamOps.removeRetractions(t)
    assert(res.select("a", "time", "diff").as[(Int, Int, Int)].collect().toSet ==
      Set((1, 2, 1), (2, 4, 1), (3, 6, 1), (4, 10, 1)))
    val snap = graft.streaming.StreamOps.streamToTable(res, Seq("a"))
      .as[Int].collect().toSet
    assert(snap == Set(1, 2, 3, 4))
    val orig = graft.streaming.StreamOps.streamToTable(t, Seq("a"))
      .as[Int].collect().toSet
    assert(orig == Set(1, 4))
  }

  test("deletions_enabled=false: insertions pass, a retraction fails the run " +
      "with the reference's message (r17 decode of test_io.py)") {
    import spark.implicits._
    val inserts = Seq((1, "upupa", 1), (3, "bubo", 1)).toDF("key", "genus", "diff")
    val ok = graft.streaming.StreamOps
      .assertDeletionsDisabled(inserts, "python-abcde")
      .collect()
    assert(ok.length == 2)
    val withDelete = Seq((1, "upupa", 1), (1, "upupa", -1)).toDF("key", "genus", "diff")
    val e = intercept[Exception] {
      graft.streaming.StreamOps.assertDeletionsDisabled(withDelete, "python-abcde").collect()
    }
    assert(SparkTestBase.causeMessages(e).exists(m =>
      m.contains("Trying to delete a row in python-abcde but deletions_enabled is set to False")))
  }
}
