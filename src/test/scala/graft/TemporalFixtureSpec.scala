package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal

/** Bit-exact replays of the reference's OWN temporal test fixtures —
  * tests/temporal/test_interval_joins.py, test_windows.py,
  * test_window_joins.py. The expected tables below are decoded verbatim
  * from those files (r15; the r14 asof decode found three divergences the
  * oracle board could not see, so every non-timed vector in these three
  * files is pinned here the same way). Integer/float fixture times are
  * interpreted as seconds. */
class TemporalFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val S = 1_000_000_000L // seconds → ns
  /** Fixture time (int/float seconds) → timestamp_ntz, exact to the µs. */
  private def tsSec(c: Column): Column =
    timestamp_micros(round(c.cast("double") * 1e6).cast("long")).cast("timestamp_ntz")
  private val NULL = -99 // null marker in collected pairs

  private def optInt(r: org.apache.spark.sql.Row, i: Int): Int =
    if (r.isNullAt(i)) NULL else r.getInt(i)

  /** Multiset of (a, b) with nulls as NULL, sorted for comparison. */
  private def pairs(df: DataFrame): Seq[(Int, Int)] =
    df.collect().map(r => (optInt(r, 0), optInt(r, 1))).toSeq.sorted

  private def quads(df: DataFrame): Seq[(Int, Int, Int, Int)] =
    df.collect().map(r => (optInt(r, 0), optInt(r, 1), optInt(r, 2), optInt(r, 3)))
      .toSeq.sorted

  private def withModes(inner: Seq[(Int, Int)], leftOnly: Seq[Int],
      rightOnly: Seq[Int])(how: String): Seq[(Int, Int)] = {
    val l = if (how == "left" || how == "outer") leftOnly.map((_, NULL)) else Nil
    val r = if (how == "right" || how == "outer") rightOnly.map((NULL, _)) else Nil
    (inner ++ l ++ r).sorted
  }
  private val MODES = Seq("inner", "left", "right", "outer")

  // ─────────────── test_interval_joins.py ───────────────

  private def ijL = Seq((1, -1), (2, 0), (3, 2), (4, 3), (5, 7), (6, 13))
    .toDF("a", "ti").withColumn("lt", tsSec(col("ti"))).drop("ti")
  private def ijR = Seq((1, 2), (2, 5), (3, 6), (4, 10), (5, 15))
    .toDF("b", "ri").withColumn("rt", tsSec(col("ri"))).drop("ri")

  test("interval_join_time_only (d ∈ {1,2,3} × all four modes) replays bit-exactly") {
    val expect: Map[Int, (Seq[(Int, Int)], Seq[Int], Seq[Int])] = Map(
      1 -> ((Seq((3, 1), (4, 1), (5, 3)), Seq(1, 2, 6), Seq(2, 4, 5))),
      2 -> ((Seq((2, 1), (3, 1), (4, 1), (4, 2), (5, 2), (5, 3), (6, 5)),
        Seq(1), Seq(4))),
      3 -> ((Seq((1, 1), (2, 1), (3, 1), (3, 2), (4, 1), (4, 2), (4, 3),
        (5, 2), (5, 3), (5, 4), (6, 4), (6, 5)), Nil, Nil)))
    for (d <- Seq(1, 2, 3); how <- MODES) {
      val (inner, lo, ro) = expect(d)
      val out = pairs(Temporal.intervalJoin(ijL, ijR, col("lt"), col("rt"),
        -d * S, d * S, lit(true), how).select("a", "b"))
      assert(out == withModes(inner, lo, ro)(how), s"d=$d how=$how")
    }
  }

  test("interval_join empty and shifted point intervals replay bit-exactly") {
    val l = Seq((1, -1), (2, 0), (3, 2), (4, 3), (5, 4), (6, 10))
      .toDF("a", "ti").withColumn("lt", tsSec(col("ti"))).drop("ti")
    val r = Seq((1, 0), (2, 2), (3, 3), (4, 5), (5, 11))
      .toDF("b", "ri").withColumn("rt", tsSec(col("ri"))).drop("ri")
    for (how <- MODES) {
      val e0 = withModes(Seq((2, 1), (3, 2), (4, 3)), Seq(1, 5, 6), Seq(4, 5))(how)
      assert(pairs(Temporal.intervalJoin(l, r, col("lt"), col("rt"),
        0L, 0L, lit(true), how).select("a", "b")) == e0, s"interval(0,0) how=$how")
      val e1 = withModes(Seq((1, 1), (3, 3), (5, 4), (6, 5)), Seq(2, 4), Seq(2))(how)
      assert(pairs(Temporal.intervalJoin(l, r, col("lt"), col("rt"),
        S, S, lit(true), how).select("a", "b")) == e1, s"interval(1,1) how=$how")
    }
  }

  test("interval_join_non_symmetric: ten asymmetric bounds replay bit-exactly") {
    // the reference derives each expectation from this full pair table
    val base = Seq((1, 1, -1, 2), (2, 1, 0, 2), (3, 1, 2, 2), (3, 2, 2, 5),
      (4, 1, 3, 2), (4, 2, 3, 5), (4, 3, 3, 6), (5, 2, 7, 5), (5, 3, 7, 6),
      (5, 4, 7, 10), (6, 4, 13, 10), (6, 5, 13, 15))
    val boundsList = Seq((-1, 0), (0, 1), (-2, 0), (0, 2), (-2, 1), (-1, 2),
      (-3, 0), (0, 3), (2, 3), (-3, -2))
    for ((lo, hi) <- boundsList) {
      val expected = base.collect { case (a, b, lt, rt)
        if lt + lo <= rt && rt <= lt + hi => (a, b) }.sorted
      val out = pairs(Temporal.intervalJoin(ijL, ijR, col("lt"), col("rt"),
        lo * S, hi * S, lit(true), "inner").select("a", "b"))
      assert(out == expected, s"bounds=($lo,$hi)")
    }
  }

  test("interval_join rejects an empty interval like the reference's ValueError") {
    intercept[IllegalArgumentException] {
      Temporal.intervalJoin(ijL, ijR, col("lt"), col("rt"), S, 0L, lit(true))
    }
    intercept[IllegalArgumentException] {
      Temporal.intervalJoin(ijL, ijR, col("lt"), col("rt"), 15 * S, -10 * S, lit(true))
    }
  }

  test("interval_join_sharded (keys, d ∈ {1,2} × all four modes) replays bit-exactly") {
    val l = Seq((1, -2), (1, 1), (1, 4), (1, 7), (1, 8), (2, -4), (2, -3),
      (2, 1), (2, 2), (2, 4), (2, 20), (3, 1))
      .toDF("a", "lti").withColumn("lt", tsSec(col("lti")))
    val r = Seq((1, -5), (1, -4), (1, -2), (1, 0), (1, 1), (1, 7), (1, 9),
      (2, -5), (2, -3), (2, -1), (2, 0), (2, 5), (2, 6), (2, 7), (4, 0))
      .toDF("b", "rti").withColumn("rt", tsSec(col("rti")))
    // (a, b, left_t, right_t) with NULL for the unmatched side
    val expect: Map[Int, (Seq[(Int, Int, Int, Int)], Seq[(Int, Int)], Seq[(Int, Int)])] = Map(
      1 -> ((Seq((1, 1, -2, -2), (1, 1, 1, 0), (1, 1, 1, 1), (1, 1, 7, 7),
        (1, 1, 8, 7), (1, 1, 8, 9), (2, 2, -4, -5), (2, 2, -4, -3),
        (2, 2, -3, -3), (2, 2, 1, 0), (2, 2, 4, 5)),
        Seq((1, 4), (2, 2), (2, 20), (3, 1)),
        Seq((1, -5), (1, -4), (2, -1), (2, 6), (2, 7), (4, 0)))),
      2 -> ((Seq((1, 1, -2, -4), (1, 1, -2, -2), (1, 1, -2, 0), (1, 1, 1, 0),
        (1, 1, 1, 1), (1, 1, 7, 7), (1, 1, 7, 9), (1, 1, 8, 7), (1, 1, 8, 9),
        (2, 2, -4, -5), (2, 2, -4, -3), (2, 2, -3, -5), (2, 2, -3, -3),
        (2, 2, -3, -1), (2, 2, 1, -1), (2, 2, 1, 0), (2, 2, 2, 0),
        (2, 2, 4, 5), (2, 2, 4, 6)),
        Seq((1, 4), (2, 20), (3, 1)),
        Seq((1, -5), (2, 7), (4, 0)))))
    for (d <- Seq(1, 2); how <- MODES) {
      val (inner, lo, ro) = expect(d)
      val expected = (inner ++
        (if (how == "left" || how == "outer") lo.map(p => (p._1, NULL, p._2, NULL)) else Nil) ++
        (if (how == "right" || how == "outer") ro.map(p => (NULL, p._1, NULL, p._2)) else Nil)).sorted
      val out = quads(Temporal.intervalJoin(l, r, col("lt"), col("rt"),
        -d * S, d * S, col("a") === col("b"), how)
        .select("a", "b", "lti", "rti"))
      assert(out == expected, s"sharded d=$d how=$how")
    }
  }

  test("non_overlapping_times: outer rows survive with no matches at all") {
    val l = Seq((1, 0), (2, 1), (3, 2), (4, 3))
      .toDF("a", "ti").withColumn("lt", tsSec(col("ti"))).drop("ti")
    val r = Seq((1, 9), (2, 10), (3, 11))
      .toDF("b", "ri").withColumn("rt", tsSec(col("ri"))).drop("ri")
    for (how <- MODES) {
      val expected = withModes(Nil, Seq(1, 2, 3, 4), Seq(1, 2, 3))(how)
      val out = pairs(Temporal.intervalJoin(l, r, col("lt"), col("rt"),
        -S, 2 * S, col("a") === col("b"), how).select("a", "b"))
      assert(out == expected, s"non_overlapping how=$how")
    }
  }

  // ─────────────── test_window_joins.py ───────────────

  private def wjL = Seq((1, -2), (2, 1), (3, 2), (4, 3), (5, 7), (6, 13))
    .toDF("a", "ti").withColumn("lt", tsSec(col("ti"))).drop("ti")
  private def wjR = Seq((1, 2), (2, 5), (3, 6), (4, 7), (5, 14))
    .toDF("b", "ri").withColumn("rt", tsSec(col("ri"))).drop("ri")

  test("window_join_time_only tumbling(1)/tumbling(2) replays bit-exactly") {
    val expect = Map(
      1 -> ((Seq((3, 1), (5, 4)), Seq(1, 2, 4, 6), Seq(2, 3, 5))),
      2 -> ((Seq((3, 1), (4, 1), (5, 3), (5, 4)), Seq(1, 2, 6), Seq(2, 5))))
    for (d <- Seq(1, 2); how <- MODES) {
      val (inner, lo, ro) = expect(d)
      val out = pairs(Temporal.windowJoin(wjL, wjR, col("lt"), col("rt"),
        d * S, lit(true), how).select("a", "b"))
      assert(out == withModes(inner, lo, ro)(how), s"tumbling($d) how=$how")
    }
  }

  test("window_join_time_only sliding windows replay bit-exactly (incl. hop > duration)") {
    // pw.temporal.sliding(hop, duration): a pair matching in k overlapping
    // windows emits k rows; with hop > duration, rows between windows are
    // dropped even from OUTER joins
    val cases = Seq(
      // sliding(1, 2): hop 1s, duration 2s
      (2L, 1L, Seq((2, 1), (3, 1), (3, 1), (4, 1), (5, 3), (5, 4), (5, 4), (6, 5)),
        Seq(1, 1, 2, 4, 6), Seq(2, 2, 3, 5)),
      // sliding(2, 1): hop 2s, duration 1s
      (1L, 2L, Seq((3, 1)), Seq(1), Seq(3, 5)))
    for ((dur, hop, inner, lo, ro) <- cases; how <- MODES) {
      val out = pairs(Temporal.slidingWindowJoin(wjL, wjR, col("lt"), col("rt"),
        dur * S, hop * S, lit(true), how).select("a", "b"))
      assert(out == withModes(inner, lo, ro)(how), s"sliding(hop=$hop,dur=$dur) how=$how")
    }
  }

  test("session_window_join_time_only (gap and predicate variants) replays bit-exactly") {
    val l = Seq((1, 0), (2, 5), (3, 10), (4, 15), (5, 17))
      .toDF("a", "ti").withColumn("lt", tsSec(col("ti"))).drop("ti")
    val r = Seq((1, -3), (2, 2), (3, 3), (4, 6), (5, 16))
      .toDF("b", "ri").withColumn("rt", tsSec(col("ri"))).drop("ri")
    val expect = Map(
      1 -> ((Seq((2, 4), (4, 5), (5, 5)), Seq(1, 3), Seq(1, 2, 3))),
      2 -> ((Seq((1, 2), (1, 3), (1, 4), (2, 2), (2, 3), (2, 4), (4, 5), (5, 5)),
        Seq(3), Seq(1))))
    def us(c: Column) = unix_micros(c.cast("timestamp_ltz"))
    for (md <- Seq(1, 2); how <- MODES; usePredicate <- Seq(false, true)) {
      val (inner, lo, ro) = expect(md)
      val pred: Option[(Column, Column) => Column] =
        if (usePredicate) Some((p, c) => abs(us(c) - us(p)) <= lit(md * 1000000L))
        else None
      val out = pairs(Temporal.sessionWindowJoin(l, r, col("lt"), col("rt"),
        (md + 1) * S, lit(0), lit(0),
        Seq("a" -> col("a")), Seq("b" -> col("b")), how, pred)
        .select("a", "b"))
      assert(out == withModes(inner, lo, ro)(how),
        s"session md=$md how=$how predicate=$usePredicate")
    }
  }

  test("session_window_join: null keys co-session AND join (value equality, like None instances)") {
    // r15 ADVICE: null-key rows from both sides sessionized together but a
    // plain === join never matched them, so outer modes emitted rows whose
    // session bounds were merged with counterparts they could never join.
    // The reference's engine joins None instances by value equality; the
    // join key is now null-safe (<=>).
    val l = Seq((1, Some(0), 0), (2, None, 0), (3, None, 10))
      .toDF("a", "k", "ti").withColumn("lt", tsSec(col("ti"))).drop("ti")
    val r = Seq((10, None, 1), (20, Some(0), 2))
      .toDF("b", "k", "ti").withColumn("rt", tsSec(col("ti"))).drop("ti")
    def run(how: String) = Temporal.sessionWindowJoin(l, r, col("lt"), col("rt"),
      3 * S, l("k"), r("k"), Seq("a" -> col("a")), Seq("b" -> col("b")), how)
    // null-key session 1 = {L:2@0s, R:10@1s}; null-key session 2 = {L:3@10s};
    // key-0 session = {L:1@0s, R:20@2s}
    assert(pairs(run("inner").select("a", "b")) ==
      withModes(Seq((1, 20), (2, 10)), Seq(3), Nil)("inner"))
    val left = run("left")
    assert(pairs(left.select("a", "b")) ==
      withModes(Seq((1, 20), (2, 10)), Seq(3), Nil)("left"))
    // the unmatched null-key left row's session bounds cover ONLY itself
    val lone = left.filter(col("a") === 3)
      .select(unix_micros(col("s_start").cast("timestamp_ltz")),
        unix_micros(col("s_end").cast("timestamp_ltz"))).head
    assert(lone.getLong(0) == 10_000_000L && lone.getLong(1) == 10_000_000L)
  }

  // ─────────────── test_windows.py (windowby) ───────────────

  test("session_simple: predicate sessions with instances replay bit-exactly") {
    val t = Seq((0, 1, 10), (0, 2, 1), (0, 4, 3), (0, 8, 2), (0, 9, 4),
      (0, 10, 8), (1, 1, 9), (1, 2, 16))
      .toDF("instance", "ti", "v").withColumn("t", tsSec(col("ti")))
    def us(c: Column) = unix_micros(c.cast("timestamp_ltz"))
    val sess = Temporal.sessionize(t, col("t"), 0L, Seq(col("instance")),
      Some((p, c) => abs(us(c) - us(p)) <= lit(1000000L)))
    val out = sess.groupBy(col("instance"), col("_sid"))
      .agg(min(col("ti")).as("ws"), max(col("ti")).as("we"),
        min(col("ti")).as("min_t"), max(col("v")).as("max_v"),
        count(lit(1)).as("n"),
        min_by(col("ti"), struct(col("v"), col("ti"))).as("t_min_v"),
        max_by(col("ti"), struct(col("v"), col("ti"))).as("t_max_v"))
      .collect().map(r => (r.getInt(0), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getInt(5), r.getLong(6), r.getInt(7), r.getInt(8))).toSet
    assert(out == Set(
      (0, 1, 2, 1, 10, 2L, 2, 1), (0, 4, 4, 4, 3, 1L, 4, 4),
      (0, 8, 10, 8, 8, 3L, 8, 10), (1, 1, 2, 1, 16, 2L, 1, 2)))
  }

  test("session max_gap boundary is STRICT (float and mixed vectors)") {
    // test_session_max_gap: gaps of exactly max_gap SPLIT (next − cur < gap)
    val t1 = Seq(1.0, 1.1, 1.2, 3.0, 3.4, 3.5).toDF("tf")
      .withColumn("t", tsSec(col("tf")))
    val s1 = Temporal.sessionize(t1, col("t"), 150_000_000L, Seq(lit(1)))
      .groupBy("_sid").agg(min("tf").as("min_t"), count(lit(1)).as("n"))
      .collect().map(r => (r.getDouble(1), r.getLong(2))).toSet
    assert(s1 == Set((1.0, 3L), (3.0, 1L), (3.4, 2L)))
    // test_session_max_gap_mixed: int times, float gap 1.5
    val t2 = Seq(10, 11, 12, 30, 34, 35).toDF("ti")
      .withColumn("t", tsSec(col("ti")))
    val s2 = Temporal.sessionize(t2, col("t"), 1_500_000_000L, Seq(lit(1)))
      .groupBy("_sid").agg(min("ti").as("min_t"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(s2 == Set((10, 3L), (30, 1L), (34, 2L)))
  }

  private def winAgg(df: DataFrame): Set[(Int, Long, Long, Int, Int, Long)] =
    df.groupBy(col("instance"), col("w_start"), col("w_end"))
      .agg(min(col("ti")).as("min_t"), max(col("ti")).as("max_t"),
        count(lit(1)).as("n"))
      .select(col("instance"),
        unix_micros(col("w_start").cast("timestamp_ltz")) / 1000000L,
        unix_micros(col("w_end").cast("timestamp_ltz")) / 1000000L,
        col("min_t"), col("max_t"), col("n"))
      .collect().map(r => (r.getInt(0), r.getDouble(1).toLong, r.getDouble(2).toLong,
        r.getInt(3), r.getInt(4), r.getLong(5))).toSet

  test("sliding windowby (dur 10, hop 3, instances) replays bit-exactly") {
    val t = Seq((0, 12), (0, 13), (0, 14), (0, 15), (0, 16), (0, 17), (1, 10), (1, 11))
      .toDF("instance", "ti").withColumn("t", tsSec(col("ti")))
    val out = winAgg(Temporal.slide(t, col("t"), 10 * S, 3 * S))
    assert(out == Set(
      (0, 3L, 13L, 12, 12, 1L), (0, 6L, 16L, 12, 15, 4L), (0, 9L, 19L, 12, 17, 6L),
      (0, 12L, 22L, 12, 17, 6L), (0, 15L, 25L, 15, 17, 3L),
      (1, 3L, 13L, 10, 11, 2L), (1, 6L, 16L, 10, 11, 2L), (1, 9L, 19L, 10, 11, 2L)))
  }

  test("sliding windowby with origin truncates windows before it") {
    val t = Seq(12, 13, 14, 15, 16, 17).toDF("ti")
      .withColumn("t", tsSec(col("ti"))).withColumn("instance", lit(0))
    val out = winAgg(Temporal.slide(t, col("t"), 10 * S, 3 * S, Some(13 * S)))
    // reference drops windows starting before the origin entirely — t=12
    // belongs to NO window (test_sliding_origin)
    assert(out == Set((0, 13L, 23L, 13, 17, 5L), (0, 16L, 26L, 16, 17, 2L)))
  }

  test("sliding windowby with hop > duration leaves gap rows windowless") {
    val t = Seq(11, 12, 13, 14, 15, 16, 17).toDF("ti")
      .withColumn("t", tsSec(col("ti"))).withColumn("instance", lit(0))
    val out = winAgg(Temporal.slide(t, col("t"), 4 * S, 6 * S))
    assert(out == Set((0, 12L, 16L, 12, 15, 4L)))
  }

  test("tumbling windowby (instances; origin truncation) replays bit-exactly") {
    val t = Seq((0, 12), (0, 13), (0, 14), (0, 15), (0, 16), (0, 17), (1, 12), (1, 13))
      .toDF("instance", "ti").withColumn("t", tsSec(col("ti")))
    val out = winAgg(Temporal.tumble(t, col("t"), 5 * S))
    assert(out == Set((0, 10L, 15L, 12, 14, 3L), (0, 15L, 20L, 15, 17, 3L),
      (1, 10L, 15L, 12, 13, 2L)))
    // test_tumbling_origin: duration 3, origin 7 — t=3 joins no window
    val t2 = Seq(3, 12, 13, 14, 15, 16, 17).toDF("ti")
      .withColumn("t", tsSec(col("ti"))).withColumn("instance", lit(0))
    val out2 = winAgg(Temporal.tumble(t2, col("t"), 3 * S, Some(7 * S)))
    assert(out2 == Set((0, 10L, 13L, 12, 12, 1L), (0, 13L, 16L, 13, 15, 3L),
      (0, 16L, 19L, 16, 17, 2L)))
  }

  test("tumbling/sliding float times: every row lands in exactly dur/hop windows") {
    val t = (1 to 100).map(k => 0.1 * k).toDF("tf").withColumn("t", tsSec(col("tf")))
    val tumbled = Temporal.tumble(t, col("t"), 100_000_000L, Some(-100_000_000L))
    assert(tumbled.count() == 100)
    val slid = Temporal.slide(t, col("t"), 300_000_000L, 100_000_000L, Some(-100_000_000L))
    assert(slid.count() == 300)
  }

  test("intervals_over: inner drops empty probes, outer keeps them (reference vectors)") {
    val data = Seq((1, 10), (2, 1), (3, 3), (8, 2), (9, 4), (10, 8), (1, 9), (2, 16))
      .toDF("ti", "v").withColumn("dt", tsSec(col("ti")))
    val probes = Seq(2, 4, 6, 8, 10).toDF("pi").withColumn("pt", tsSec(col("pi")))
    def grouped(isOuter: Boolean): Map[Int, Seq[Int]] =
      Temporal.intervalsOver(probes, data, col("pt"), col("dt"),
          -2 * S, 1 * S, lit(true), isOuter)
        .groupBy("pi").agg(sort_array(collect_list(col("v"))).as("vs"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Int](1).toList).toMap
    val inner = grouped(isOuter = false)
    assert(inner == Map(2 -> List(1, 3, 9, 10, 16), 4 -> List(1, 3, 16),
      8 -> List(2, 4), 10 -> List(2, 4, 8)))
    val outer = grouped(isOuter = true)
    assert(outer.keySet == Set(2, 4, 6, 8, 10) && outer(6) == Nil)
  }

  test("interpolate: multi-column reference vector replays bit-exactly (test_interpolate_multiple_columns)") {
    val t = Seq(
      (1, Some(1.0), Option.empty[Double]), (2, None, Some(10.0)),
      (3, Some(3.0), Some(40.0)), (4, None, None), (5, Some(5.0), Some(50.0)),
      (6, None, None), (7, None, None), (8, None, Some(80.0)), (9, Some(9.0), None))
      .toDF("ti", "v1", "v2").withColumn("t", tsSec(col("ti")))
    val out = t.select(col("ti"),
        Temporal.interpolate(col("t"), col("v1"), Seq(lit(1))).as("v1"),
        Temporal.interpolate(col("t"), col("v2"), Seq(lit(1))).as("v2"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSet
    // interior gaps interpolate linearly in t; both ends clamp to the
    // nearest known value (reference mode=LINEAR)
    assert(out == Set((1, 1.0, 10.0), (2, 2.0, 10.0), (3, 3.0, 40.0),
      (4, 4.0, 45.0), (5, 5.0, 50.0), (6, 6.0, 60.0), (7, 7.0, 70.0),
      (8, 8.0, 80.0), (9, 9.0, 80.0)))
  }

  test("intervals_over with instances and over its own table replay bit-exactly") {
    val data = Seq((1, 10, 1), (2, 1, 1), (4, 3, 1), (8, 2, 1), (9, 4, 2),
      (10, 8, 2), (1, 9, 2), (2, 16, 2))
      .toDF("ti", "v", "inst").withColumn("dt", tsSec(col("ti")))
    val probes = Seq(2, 6, 10).toDF("pi").withColumn("pt", tsSec(col("pi")))
      .crossJoin(Seq(1, 2).toDF("pinst"))
    val out = Temporal.intervalsOver(probes, data, col("pt"), col("dt"),
        -4 * S, 2 * S, col("pinst") === col("inst"), isOuter = false)
      .groupBy("pi", "pinst").agg(sort_array(collect_list(col("v"))).as("vs"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Int](2).toList).toMap
    assert(out == Map((2, 1) -> List(1, 3, 10), (2, 2) -> List(9, 16),
      (6, 1) -> List(1, 2, 3), (6, 2) -> List(16),
      (10, 1) -> List(2), (10, 2) -> List(4, 8)))
    // test_intervals_over_works_on_same_table: probes = the data itself
    val t5 = Seq(1, 2, 3, 4, 5).toDF("ti").withColumn("dt", tsSec(col("ti")))
    val p5 = t5.select(col("ti").as("pi"), col("dt").as("pt"))
    val self = Temporal.intervalsOver(p5, t5, col("pt"), col("dt"),
        -2 * S, 0L, lit(true), isOuter = false)
      .groupBy("pi").agg(sort_array(collect_list(col("ti"))).as("vs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1).toList).toMap
    assert(self == Map(1 -> List(1), 2 -> List(1, 2), 3 -> List(1, 2, 3),
      4 -> List(2, 3, 4), 5 -> List(3, 4, 5)))
  }

  // ─────────────── test_windows_stream.py — common_behavior final tables ──────
  //
  // The reference pins streaming windowby behaviors with a 68-row stream
  // (value=i, time=(i//2)%17, sliding(duration=5, hop=3)) and a simulator
  // (generate_buffer_output) whose DiffEntry streams reduce to these FINAL
  // tables of (w_start, w_end, max_time, max_value). Rows below are the
  // simulator's output per parameterized_test combo (goldens recomputed from
  // the fixture's admission rules); the exactly_once row cross-checks against
  // the file's own hardcoded _create_expected_for_exactly_once (max_value =
  // 2·w_end−1 for the five closed windows, 67/67 for the two flushed ones).
  test("test_windows_stream.py behavior combos replay (final tables)") {
    val stream = spark.range(68).select(
      col("id").as("arrival"), col("id").as("value"), ((col("id") / 2).cast("long") % 17).as("time"))
    val expect: Map[(Long, Long, Boolean), Seq[(Long, Long, Long, Long)]] = Map(
      // (delay, cutoff, keep) → final (w_start, w_end, max_time, max_value)
      (0L, 0L, true) -> Seq((-3, 2, 1, 3), (0, 5, 4, 9), (3, 8, 7, 15),
        (6, 11, 10, 21), (9, 14, 13, 27), (12, 17, 16, 67), (15, 20, 16, 67)),
      (0L, 0L, false) -> Seq((12, 17, 16, 67), (15, 20, 16, 67)),
      (1L, 0L, true) -> Seq((-3, 2, 1, 3), (0, 5, 4, 9), (3, 8, 7, 15),
        (6, 11, 10, 21), (9, 14, 13, 27), (12, 17, 16, 67), (15, 20, 16, 67)),
      (1L, 0L, false) -> Seq((12, 17, 16, 67), (15, 20, 16, 67)),
      (0L, 1L, true) -> Seq((-3, 2, 1, 3), (0, 5, 4, 9), (3, 8, 7, 15),
        (6, 11, 10, 21), (9, 14, 13, 27), (12, 17, 16, 67), (15, 20, 16, 67)),
      (0L, 1L, false) -> Seq((12, 17, 16, 67), (15, 20, 16, 67)),
      (1L, 1L, true) -> Seq((-3, 2, 1, 3), (0, 5, 4, 9), (3, 8, 7, 15),
        (6, 11, 10, 21), (9, 14, 13, 27), (12, 17, 16, 67), (15, 20, 16, 67)),
      (1L, 1L, false) -> Seq((12, 17, 16, 67), (15, 20, 16, 67)),
      // test_high_delay_high_buffer_keep_results: cutoff=6 keeps windows
      // open into the second pass over the 0..16 time cycle — [6,11) and
      // [9,14) absorb late values 55 and 61 the cutoff=1 combos freeze out
      (5L, 6L, true) -> Seq((-3, 2, 1, 3), (0, 5, 4, 9), (3, 8, 7, 15),
        (6, 11, 10, 55), (9, 14, 13, 61), (12, 17, 16, 67), (15, 20, 16, 67)),
      // test_exactly_once / test_exactly_once_from_behavior (delay=6, cutoff=1)
      (6L, 1L, true) -> Seq((-3, 2, 1, 3), (0, 5, 4, 9), (3, 8, 7, 15),
        (6, 11, 10, 21), (9, 14, 13, 27), (12, 17, 16, 67), (15, 20, 16, 67)))
    for (((delay, cutoff, keep), rows) <- expect) {
      val out = Temporal.windowBehaviorFinal(stream, col("time"), col("arrival"),
          dur = 5L, hop = 3L, delay = delay, cutoff = cutoff, keepResults = keep)(
          max(col("time")).as("max_time"), max(col("value")).as("max_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
      assert(out == rows, s"combo delay=$delay cutoff=$cutoff keep=$keep")
    }
  }

  // ─────────── test_interval_joins_stream.py — forgetting final tables ───────
  //
  // Both sides stream t=0..4 twice (batch clock __time__ = 2,4,…,20) under
  // common_behavior(0, cutoff=2, keep_results): the second pass's t=0,1,2 are
  // frozen (t+cutoff ≤ prev-batch frontier 4) while t=3,4 are admitted and
  // ALSO pair with the still-alive first-pass rows → (3,3)/(4,4) appear ×4;
  // keep=false drops pairs not outliving the final frontier.
  test("test_interval_joins_stream.py forgetting replays (final tables)") {
    val side = Seq((0, 2), (1, 4), (2, 6), (3, 8), (4, 10),
      (0, 12), (1, 14), (2, 16), (3, 18), (4, 20)).toDF("t", "arr")
    val keepExpected = Seq((0, 0), (1, 1), (2, 2),
      (3, 3), (3, 3), (3, 3), (3, 3), (4, 4), (4, 4), (4, 4), (4, 4))
    val removeExpected = keepExpected.drop(3)
    // interval(0,0) on the unit grid; interval(-0.1,0.1) on a ×1000 grid —
    // the reference parametrizes both, with identical expected tables
    for ((mul, lo, hi) <- Seq((1, 0L, 0L), (1000, -100L, 100L));
         keep <- Seq(true, false)) {
      val s = side.withColumn("tg", col("t") * mul)
      val out = Temporal.intervalJoinBehavior(s, s, col("tg"), col("tg"),
          col("arr"), col("arr"), lo, hi, cutoff = 2L * mul, keepResults = keep)
        .select(col("left.t").as("lt"), col("right.t").as("rt"))
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted
      assert(out == (if (keep) keepExpected else removeExpected),
        s"mul=$mul keep=$keep")
    }
    // test_forgetting_with_instance: t1.v == t2.v doubles every batch; the
    // expected table is the same block per v ∈ {0, 1}
    val inst = Seq(0, 1).toDF("v").crossJoin(side)
    for (keep <- Seq(true, false)) {
      val exp = (for (v <- Seq(0, 1);
        (lt, rt) <- if (keep) keepExpected else removeExpected)
        yield (v, lt, rt)).sorted
      val out = Temporal.intervalJoinBehavior(inst, inst, col("t"), col("t"),
          col("arr"), col("arr"), 0L, 0L, cutoff = 2L, keepResults = keep,
          keys = Seq("v" -> "v"))
        .select(col("left.v").as("v"), col("left.t").as("lt"), col("right.t").as("rt"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq.sorted
      assert(out == exp, s"instance keep=$keep")
    }
  }

  // ─────────── test_asof_joins_stream.py — cutoff/delay final tables ─────────
  //
  // asof_join_left with common_behavior(cutoff=2): a frozen QUERY row (a=6,
  // t=2 arriving against left frontier 5) disappears entirely — it does not
  // even emit unmatched; a frozen DATA row (b=3, t=2 against right frontier
  // 4) never replaces earlier matches (keep=true final keeps b=1 matches);
  // keep=false refilters by the final inclusive frontiers (left 6, right 4).
  test("test_asof_joins_stream.py cutoff/delay replay (final tables)") {
    val queries = Seq((1, 2, 2), (2, 3, 2), (3, 3, 4), (4, 5, 4), (6, 2, 6),
      (7, 6, 8)).toDF("a", "t", "arr")
    val data = Seq((1, 1, 4), (2, 4, 6), (3, 2, 8)).toDF("b", "t", "arr")
    def run(cutoff: Long, keep: Boolean): Seq[(Int, Int, Int, Int)] =
      Temporal.asofJoinBehaviorLeft(queries, data, col("t"), col("t"),
          col("arr"), col("arr"), cutoff, keepResults = keep)
        .select(col("left.a"), col("left.t").as("tl"),
          col("right.b"), col("right.t").as("tr"))
        .collect().map(r => (optInt(r, 0), optInt(r, 1), optInt(r, 2), optInt(r, 3)))
        .toSeq.sorted
    assert(run(2L, keep = true) == Seq((1, 2, 1, 1), (2, 3, 1, 1),
      (3, 3, 1, 1), (4, 5, 2, 4), (7, 6, 2, 4)))
    assert(run(2L, keep = false) == Seq((4, 5, 2, 4), (7, 6, 2, 4)))
    // test_without_behavior / test_delay: no cutoff — delay buffers emission
    // only (flushed at end), so both share one final table where the late
    // b=3 (t=2) wins every backward match at t ≤ 3
    val noCutoff = Seq((1, 2, 3, 2), (2, 3, 3, 2), (3, 3, 3, 2), (4, 5, 2, 4),
      (6, 2, 3, 2), (7, 6, 2, 4))
    assert(run(1L << 40, keep = true) == noCutoff)
  }

  // ───── tests/temporal/test_operators.py — _freeze/_forget/_buffer streams ───
  //
  // Full DiffEntry-stream replays of the behavior primitives (threshold =
  // t+2, batch clock = __time__): freeze/forget gate on the EXCLUSIVE
  // (prev-batch) per-instance frontier while buffer releases on the
  // INCLUSIVE one; forget retracts at the first global batch whose frontier
  // reaches the threshold (even one where the instance has no rows); late
  // rows and upstream retractions of already-gone rows vanish silently;
  // unreleased buffered rows flush at end (Long.MaxValue here for the
  // reference's u64::MAX−2 stamp).
  private def behaviorInput = Seq((1, 2, 2), (1, 3, 2), (1, 5, 4), (1, 15, 8),
    (1, 7, 10), (2, 4, 2), (2, 8, 4), (2, 9, 8), (3, 1, 6)).toDF("a", "t", "arr")

  test("test_operators.py _freeze vectors replay") {
    val in = Seq((1, 2, 2), (1, 3, 2), (1, 5, 6), (1, 15, 8), (1, 7, 10),
      (2, 4, 2), (2, 8, 4), (2, 5, 8), (3, 1, 6)).toDF("a", "t", "arr")
    def got(inst: Seq[org.apache.spark.sql.Column]) =
      Temporal.freezeReplay(in, col("t"), col("t") + 2, col("arr"), inst)
        .select("a", "t", "arr").as[(Int, Int, Int)].collect().toSeq.sorted
    assert(got(Seq(col("a"))) == Seq((1, 2, 2), (1, 3, 2), (1, 5, 6),
      (1, 15, 8), (2, 4, 2), (2, 8, 4), (3, 1, 6)))
    assert(got(Nil) == Seq((1, 2, 2), (1, 3, 2), (1, 15, 8), (2, 4, 2), (2, 8, 4)))
  }

  test("test_operators.py _forget vectors replay (full diff streams)") {
    def got(in: org.apache.spark.sql.DataFrame, inst: Seq[org.apache.spark.sql.Column]) =
      Temporal.forgetReplay(in, col("t"), col("t") + 2, "arr", None, inst)
        .select("a", "t", "time", "diff").as[(Int, Int, Long, Int)]
        .collect().toSeq.sorted
    assert(got(behaviorInput, Seq(col("a"))) == Seq(
      (1, 2, 2L, 1), (1, 2, 6L, -1), (1, 3, 2L, 1), (1, 3, 6L, -1),
      (1, 5, 4L, 1), (1, 5, 10L, -1), (1, 15, 8L, 1),
      (2, 4, 2L, 1), (2, 4, 6L, -1), (2, 8, 4L, 1), (2, 9, 8L, 1),
      (3, 1, 6L, 1)).sorted)
    assert(got(behaviorInput, Nil) == Seq(
      (1, 2, 2L, 1), (1, 2, 4L, -1), (1, 3, 2L, 1), (1, 3, 6L, -1),
      (1, 5, 4L, 1), (1, 5, 6L, -1), (1, 15, 8L, 1),
      (2, 4, 2L, 1), (2, 4, 6L, -1), (2, 8, 4L, 1), (2, 8, 10L, -1),
      (2, 9, 8L, 1), (2, 9, 10L, -1)).sorted)
    // test_forget_non_append_only: upstream retractions pass only for
    // still-alive rows; forgotten/late rows swallow them
    val naIn = Seq((1, 2, 1), (5, 4, 1), (5, 6, 1), (1, 8, -1), (2, 10, 1),
      (2, 12, -1), (5, 14, -1), (8, 16, 1), (8, 18, 1)).toDF("x", "arr", "d")
    val naOut = Temporal.forgetReplay(naIn, col("x"), col("x") + 2, "arr", Some("d"))
      .select("x", "time", "diff").as[(Int, Long, Int)].collect().toSeq.sorted
    assert(naOut == Seq((1, 2L, 1), (1, 6L, -1), (5, 4L, 1), (5, 6L, 1),
      (5, 14L, -1), (5, 18L, -1), (8, 16L, 1), (8, 18L, 1)).sorted)
  }

  test("test_operators.py _buffer vectors replay (full diff streams)") {
    val MAX = Long.MaxValue
    def got(in: org.apache.spark.sql.DataFrame, inst: Seq[org.apache.spark.sql.Column]) =
      Temporal.bufferReplay(in, col("t"), col("t") + 2, "arr", None, inst)
        .select("a", "t", "time", "diff").as[(Int, Int, Long, Int)]
        .collect().toSeq.sorted
    assert(got(behaviorInput, Seq(col("a"))) == Seq(
      (1, 2, 4L, 1), (1, 3, 4L, 1), (1, 5, 8L, 1), (1, 15, MAX, 1),
      (1, 7, 10L, 1), (2, 4, 4L, 1), (2, 8, MAX, 1), (2, 9, MAX, 1),
      (3, 1, MAX, 1)).sorted)
    assert(got(behaviorInput, Nil) == Seq(
      (1, 2, 2L, 1), (1, 3, 4L, 1), (1, 5, 4L, 1), (1, 15, MAX, 1),
      (1, 7, 10L, 1), (2, 4, 4L, 1), (2, 8, 8L, 1), (2, 9, 8L, 1),
      (3, 1, 6L, 1)).sorted)
    // test_buffer_non_append_only: a retraction during buffering cancels the
    // row silently; after release both sides pass through
    val naIn = Seq((1, 2, 1), (5, 4, 1), (5, 6, 1), (1, 8, -1), (2, 10, 1),
      (2, 12, -1), (5, 14, -1), (8, 16, 1), (8, 18, 1)).toDF("x", "arr", "d")
    val naOut = Temporal.bufferReplay(naIn, col("x"), col("x") + 2, "arr", Some("d"))
      .select("x", "time", "diff").as[(Int, Long, Int)].collect().toSeq.sorted
    assert(naOut == Seq((1, 4L, 1), (1, 8L, -1), (2, 10L, 1), (2, 12L, -1),
      (5, 16L, 1), (8, MAX, 1), (8, MAX, 1)).sorted)
  }
}
