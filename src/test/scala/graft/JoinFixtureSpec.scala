package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps
import graft.streaming.StreamOps.JoinEvent

/** Bit-exact replays of the reference's join fixtures from tests/test_joins.py
  * — outer-join multiplicities and the four test_inner_join_exactly_once
  * vectors (r15 decode: `left_exactly_once`/`right_exactly_once` were
  * missing surface; a matched row on an exactly-once side joins at most
  * once, dataflow.rs:2796). Each reference `__time__` step is one
  * micro-batch. */
class JoinFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("left join multiplicities: k matches → k rows, 0 matches → 1 null row (test_left_join_015/duplicates_02)") {
    val t1 = Seq(11, 12, 13, 14).toDF("a")
    val t2 = Seq(11, 12, 13, 13).toDF("c")
    val out = t1.join(t2, t1("a") === t2("c"), "left_outer")
      .select(t2("c")).collect()
      .map(r => if (r.isNullAt(0)) -99 else r.getInt(0)).toSeq.sorted
    assert(out == Seq(-99, 11, 12, 13, 13))
    // duplicates_02: left-side columns duplicate per match
    val l2 = Seq((11, 111), (12, 112), (13, 113), (14, 114)).toDF("a", "b")
    val r2 = Seq((11, 211), (13, 212), (13, 213), (13, 214)).toDF("c", "d")
    val dup = l2.join(r2, l2("a") === r2("c"), "left_outer")
      .select(l2("a") * l2("a"), l2("a") + l2("b")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted
    assert(dup == Seq((121, 122), (144, 124), (169, 126), (169, 126),
      (169, 126), (196, 128)))
  }

  /** Drive the kernel with the reference's __time__ batches; returns the
    * emitted (a, b, c) rows with their batch index. */
  private def runXOnce(leftOnce: Boolean, rightOnce: Boolean): Seq[(Int, Int, Int)] = {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[JoinEvent[(Int, Int), (Int, Int)]]
    val flat = input.toDS()
      .groupByKey(e => if (e.isLeft) e.left.get._1 else e.right.get._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        StreamOps.exactlyOnceJoinKernel[Int, (Int, Int), (Int, Int)](leftOnce, rightOnce))
    val name = s"xonce_${leftOnce}_$rightOnce"
    val q = flat.map { case (k, l, r) => (k, l._2, r._2) }
      .toDF("a", "b", "c").writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def L(a: Int, b: Int) = JoinEvent[(Int, Int), (Int, Int)](true, Some((a, b)), None)
    def R(a: Int, c: Int) = JoinEvent[(Int, Int), (Int, Int)](false, None, Some((a, c)))
    // __time__ 2 / 4 / 6 / 8 from test_inner_join_exactly_once
    input.addData(L(1, 10), R(2, 200), R(3, 300)); q.processAllAvailable()
    input.addData(L(2, 20), R(1, 100)); q.processAllAvailable()
    input.addData(L(3, 30), R(2, 400)); q.processAllAvailable()
    input.addData(L(1, 40)); q.processAllAvailable()
    val out = spark.table(name).as[(Int, Int, Int)].collect().toSeq.sorted
    q.stop()
    out
  }

  test("inner join exactly_once: all four reference vectors replay bit-exactly") {
    val base = Seq((1, 10, 100), (2, 20, 200), (3, 30, 300))
    assert(runXOnce(leftOnce = true, rightOnce = true) == base)
    assert(runXOnce(leftOnce = true, rightOnce = false) ==
      (base :+ ((1, 40, 100))).sorted)
    assert(runXOnce(leftOnce = false, rightOnce = true) ==
      (base :+ ((2, 20, 400))).sorted)
    assert(runXOnce(leftOnce = false, rightOnce = false) ==
      (base ++ Seq((1, 40, 100), (2, 20, 400))).sorted)
  }

  test("exactly_once rejects repeated same-key entries in one batch (test_inner_join_exactly_once_with_repeats)") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[JoinEvent[(Int, Int), (Int, Int)]]
    val flat = input.toDS()
      .groupByKey(e => if (e.isLeft) e.left.get._1 else e.right.get._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        StreamOps.exactlyOnceJoinKernel[Int, (Int, Int), (Int, Int)](true, true))
    val q = flat.map { case (k, l, r) => (k, l._2, r._2) }
      .toDF("a", "b", "c").writeStream.format("memory").queryName("xonce_repeat")
      .outputMode("append").start()
    // the reference errors when the repeats MATCH (the doubled retraction
    // trips assert_distinct_batch), not when they arrive: the two rights
    // at __time__ 2 pass, the left at __time__ 4 raises
    input.addData(
      JoinEvent[(Int, Int), (Int, Int)](false, None, Some((2, 200))),
      JoinEvent[(Int, Int), (Int, Int)](false, None, Some((2, 500))))
    q.processAllAvailable() // no match yet — no error
    input.addData(JoinEvent[(Int, Int), (Int, Int)](true, Some((2, 20)), None))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    assert(SparkTestBase.causeMessages(err).exists(_.contains("Repeated entry in a batch")))
    q.stop()
  }

  test("exactly_once: unmatched rows accumulate; a multi-match on an exactly-once side errors") {
    implicit val sql = spark.sqlContext
    // leftOnce only: two lefts held across batches both legitimately match
    // one arriving right (each joins once; the right is reusable)
    val input = MemoryStream[JoinEvent[(Int, Int), (Int, Int)]]
    val flat = input.toDS()
      .groupByKey(e => if (e.isLeft) e.left.get._1 else e.right.get._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        StreamOps.exactlyOnceJoinKernel[Int, (Int, Int), (Int, Int)](true, false))
    val q = flat.map { case (k, l, r) => (k, l._2, r._2) }
      .toDF("a", "b", "c").writeStream.format("memory").queryName("xonce_accum")
      .outputMode("append").start()
    input.addData(JoinEvent[(Int, Int), (Int, Int)](true, Some((7, 10)), None))
    q.processAllAvailable()
    input.addData(JoinEvent[(Int, Int), (Int, Int)](true, Some((7, 40)), None))
    q.processAllAvailable()
    input.addData(JoinEvent[(Int, Int), (Int, Int)](false, None, Some((7, 100))))
    q.processAllAvailable()
    assert(spark.table("xonce_accum").as[(Int, Int, Int)].collect().toSeq.sorted ==
      Seq((7, 10, 100), (7, 40, 100)))
    // and nothing re-matches: both lefts are retired
    input.addData(JoinEvent[(Int, Int), (Int, Int)](false, None, Some((7, 200))))
    q.processAllAvailable()
    assert(spark.table("xonce_accum").count() == 2)
    q.stop()
  }
}
