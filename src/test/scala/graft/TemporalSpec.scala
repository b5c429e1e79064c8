package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal
import graft.functions.Exprs.Duration

class TemporalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s).toLocalDateTime

  test("asof backward: inclusive tie, latest match wins") {
    import spark.implicits._
    val l = Seq((1L, "2024-01-01 00:10:00"), (1L, "2024-01-01 00:20:00"), (2L, "2024-01-01 00:10:00"))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp_ntz"))
    val r = Seq((1L, "2024-01-01 00:10:00", 10), (1L, "2024-01-01 00:15:00", 11), (2L, "2024-01-01 00:30:00", 12))
      .toDF("k", "t", "v").withColumn("t", col("t").cast("timestamp_ntz"))
    val out = Temporal.asofJoin(l, r, col("t"), col("t"), l("k"), r("k"),
      Seq("v" -> col("v")), "backward", "left")
      .select("k", "t", "v").collect()
      .map(x => (x.getLong(0), x.get(1).toString.take(16), if (x.isNullAt(2)) -1 else x.getInt(2)))
      .toSet
    assert(out == Set(
      (1L, "2024-01-01T00:10", 10),  // tie matches inclusively
      (1L, "2024-01-01T00:20", 11),  // latest ≤ t
      (2L, "2024-01-01T00:10", -1))) // nothing before
  }

  test("asof forward inner drops unmatched") {
    import spark.implicits._
    val l = Seq((1L, "2024-01-01 00:20:00"), (2L, "2024-01-01 00:50:00"))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp_ntz"))
    val r = Seq((1L, "2024-01-01 00:25:00", 1), (2L, "2024-01-01 00:40:00", 2))
      .toDF("k", "t", "v").withColumn("t", col("t").cast("timestamp_ntz"))
    val out = Temporal.asofJoin(l, r, col("t"), col("t"), l("k"), r("k"),
      Seq("v" -> col("v")), "forward", "inner").select("k", "v").collect()
    assert(out.map(x => (x.getLong(0), x.getInt(1))).toSet == Set((1L, 1)))
  }

  test("asof nearest: tie prefers forward (reference _asof_join.py:312 strict <)") {
    import spark.implicits._
    val l = Seq((1L, "2024-01-01 00:20:00")).toDF("k", "t")
      .withColumn("t", col("t").cast("timestamp_ntz"))
    val r = Seq((1L, "2024-01-01 00:10:00", 100), (1L, "2024-01-01 00:30:00", 200))
      .toDF("k", "rt", "v").withColumn("rt", col("rt").cast("timestamp_ntz"))
    val out = Temporal.asofNearest(l, r, "t", "rt", "k", "k",
      Seq("v" -> col("v"))).select("v").head.getInt(0)
    assert(out == 200) // equidistant → forward, like the reference
  }

  test("reference asof vectors (tests/temporal/test_asof_joins.py) replay bit-exactly") {
    import spark.implicits._
    // the reference fixtures use t*2 sync columns, per-key instances, LEFT
    // mode with defaults; longs cast to timestamps (order/distance preserved)
    def df(rows: Seq[(Int, Int, Int)], v: String) = rows.toDF("k", v, "t0")
      .withColumn("t", col("t0").cast("long") * 2).drop("t0")
    val l0 = Seq((0, 1, 1), (0, 2, 4), (0, 3, 5), (0, 4, 6), (0, 5, 7),
      (0, 6, 11), (0, 7, 12), (1, 8, 5), (1, 9, 7))
    val r0 = Seq((1, 7, 2), (1, 3, 8), (0, 0, 2), (0, 6, 3), (0, 2, 7),
      (0, 3, 8), (0, 9, 9), (0, 7, 13), (0, 4, 14))
    def run(lRows: Seq[(Int, Int, Int)], dir: String, default: Int) = {
      val l = df(lRows, "lv"); val r = df(r0, "rv")
      Temporal.asofJoin(l, r, col("t"), col("t"), col("k"), r("k"),
          Seq("rv" -> col("rv")), dir, "left")
        .select(col("k"), col("t"), coalesce(col("rv"), lit(default)).as("vr"),
          (col("lv") * 2 + coalesce(col("rv"), lit(default))).as("e"))
        .collect().map(x => (x.getInt(0), x.getLong(1), x.getInt(2), x.getInt(3)))
    }
    def asSet(rows: Array[(Int, Long, Int, Int)], n: Int) = {
      assert(rows.length == n, s"expected $n rows, got ${rows.length}") // no dup/drop
      rows.toSet
    }
    // test_asof_left (backward, defaults {val: -1})
    assert(asSet(run(l0, "backward", -1), 9) == Set(
      (0, 2L, -1, 1), (0, 8L, 6, 10), (0, 10L, 6, 12), (0, 12L, 6, 14),
      (0, 14L, 2, 12), (0, 22L, 9, 21), (0, 24L, 9, 23),
      (1, 10L, 7, 23), (1, 14L, 7, 25)))
    // test_asof_left_forward (extra left (1,10,20), defaults {val: 100})
    assert(asSet(run(l0 :+ ((1, 10, 20)), "forward", 100), 10) == Set(
      (0, 2L, 0, 2), (0, 8L, 2, 6), (0, 10L, 2, 8), (0, 12L, 2, 10),
      (0, 14L, 2, 12), (0, 22L, 7, 19), (0, 24L, 7, 21),
      (1, 10L, 3, 19), (1, 14L, 3, 21), (1, 40L, 100, 120)))
    // test_asof_left_nearest (keyless; pins the forward tie at left 80:
    // rights {70, 90} both at distance 10 -> 90)
    val ln = Seq(1, 20, 40, 60, 80).toDF("t0")
      .withColumn("t", col("t0").cast("long") * 2).withColumn("k", lit(1))
    val rn = Seq(-15, 10, 35, 45, 50).toDF("rt0")
      .withColumn("rt", col("rt0").cast("long") * 2).withColumn("k", lit(1))
    val near = Temporal.asofNearest(ln, rn, "t", "rt", "k", "k",
        Seq("rt0" -> col("rt0")))
      .select("t", "rt0").collect().map(x => (x.getLong(0), x.getInt(1)))
    assert(near.length == 5)
    assert(near.toSet == Set((2L, 10), (40L, 10), (80L, 45), (120L, 50), (160L, 50)))
  }

  test("reference asof RIGHT vector (test_more_asof_right) replays bit-exactly") {
    import spark.implicits._
    val l = Seq((1, 3), (1, 5), (1, 7), (2, 2), (2, 6), (3, 10), (3, 11),
      (3, 13), (4, -4), (4, -1), (4, 0)).toDF("k1", "t")
    val r = Seq((1, 4), (2, 1), (2, 3), (3, 12), (4, -3), (4, -2)).toDF("k1", "t")
    val out = Temporal.asofJoinRight(l, r, col("t"), col("t"),
        col("k1"), r("k1"), Seq("lk" -> col("k1"), "lt" -> col("t")))
      .select("lk", "lt", "t").collect()
      .map(x => (if (x.isNullAt(0)) -99 else x.getInt(0),
        if (x.isNullAt(1)) -99 else x.getInt(1), x.getInt(2)))
    assert(out.length == 6)
    assert(out.toSet == Set((-99, -99, 1), (1, 3, 4), (2, 2, 3), (3, 11, 12),
      (4, -4, -3), (4, -4, -2)))
  }

  test("reference asof FULL vector (test_asof_full) replays bit-exactly incl. asymmetric ties") {
    import spark.implicits._
    val t1 = Seq((0, 1, 1), (0, 2, 4), (0, 3, 5), (0, 4, 6), (0, 5, 7),
      (0, 6, 11), (0, 7, 12), (1, 8, 5), (1, 9, 7)).toDF("k", "lval", "t")
    val t2 = Seq((1, 7, 2), (1, 3, 8), (0, 0, 2), (0, 6, 3), (0, 2, 7),
      (0, 3, 8), (0, 9, 9), (0, 7, 13), (0, 4, 14)).toDF("k", "rval", "t")
    val out = Temporal.asofJoinFull(t1, t2, col("t"), col("t"),
        col("k"), col("k"), Seq("lval" -> col("lval")), Seq("rval" -> col("rval")))
      .select(col("_k"), col("side"), col("_t").cast("int").as("t"),
        coalesce(col("lval"), lit(0)).as("v1"), coalesce(col("rval"), lit(0)).as("v2"))
      .collect().map(x => (x.getInt(0), x.getBoolean(1), x.getInt(2),
        x.getInt(3), x.getInt(4), x.getInt(3) + x.getInt(4)))
    assert(out.length == 18)
    assert(out.toSet == Set(
      (0, false, 1, 1, 0, 1), (0, false, 4, 2, 6, 8), (0, false, 5, 3, 6, 9),
      (0, false, 6, 4, 6, 10), (0, false, 7, 5, 6, 11),
      (0, false, 11, 6, 9, 15), (0, false, 12, 7, 9, 16),
      (0, true, 2, 1, 0, 1), (0, true, 3, 1, 6, 7), (0, true, 7, 5, 2, 7),
      (0, true, 8, 5, 3, 8), (0, true, 9, 5, 9, 14), (0, true, 13, 7, 7, 14),
      (0, true, 14, 7, 4, 11),
      (1, false, 5, 8, 7, 15), (1, false, 7, 9, 7, 16),
      (1, true, 2, 0, 7, 7), (1, true, 8, 9, 3, 12)))
  }

  test("asofJoinFull: equal-time same-side duplicates match deterministically") {
    import spark.implicits._
    // three rights share one timestamp with distinct payloads: the
    // left-driven match must be the same payload regardless of input
    // partitioning (r15 ADVICE: last() over a (t, side)-only order picked
    // a partition-order-dependent peer; the reference's make_sort_key
    // ends in the row id)
    val l = Seq((0, 1, 10)).toDF("k", "lval", "t")
    def run(parts: Int): Set[(Boolean, Int, Int, Int)] =
      Temporal.asofJoinFull(l,
          Seq((0, 101, 5), (0, 102, 5), (0, 103, 5)).toDF("k", "rval", "t")
            .repartition(parts),
          col("t"), col("t"), col("k"), col("k"),
          Seq("lval" -> col("lval")), Seq("rval" -> col("rval")))
        .select(col("side"), col("_t").cast("int"),
          coalesce(col("lval"), lit(-1)), coalesce(col("rval"), lit(-1)))
        .collect()
        .map(x => (x.getBoolean(0), x.getInt(1), x.getInt(2), x.getInt(3)))
        .toSet
    val runs = Seq(1, 3, 7, 32).map(run)
    assert(runs.distinct.size == 1,
      s"matched peers must not depend on partitioning: $runs")
    // every right-driven row sees the equal-time group's running state;
    // the single left must match exactly one deterministic right payload
    assert(runs.head.count(_._1 == false) == 1)
  }

  test("sessionize: strict gap boundary") {
    import spark.implicits._
    val df = Seq((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:30:00"),
      (1L, "2024-01-01 01:00:01"), (2L, "2024-01-01 00:00:00"))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp_ntz"))
    val sess = Temporal.sessionize(df, col("t"), Duration.minutes(30), Seq(col("k")))
    val n = sess.select("k", "_sid").distinct().count()
    // reference _window.py:77 merges on next − cur < max_gap (STRICT): user1's
    // gap of exactly 30min SPLITS, so user1 has 3 sessions and user2 has 1
    assert(n == 4)
  }

  test("custom-predicate session merge") {
    import spark.implicits._
    val df = Seq((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 02:00:00"))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp_ntz"))
    val sess = Temporal.sessionize(df, col("t"), 0L, Seq(col("k")),
      predicate = Some((prev, cur) => lit(true))) // merge everything
    assert(sess.select("_sid").distinct().count() == 1)
  }

  test("interpolate clamps endpoints") {
    import spark.implicits._
    val df = Seq((1L, 0L, None: Option[Double]), (1L, 10L, Some(10.0)),
      (1L, 20L, None), (1L, 30L, Some(30.0)), (1L, 40L, None))
      .toDF("k", "us", "v").withColumn("t", timestamp_micros(col("us")).cast("timestamp_ntz"))
    val out = df.withColumn("vi", Temporal.interpolate(col("t"), col("v"), Seq(col("k"))))
      .orderBy("us").select("vi").collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(10.0, 10.0, 20.0, 30.0, 30.0))
  }

  test("tumble/slide window assignment counts") {
    import spark.implicits._
    val df = Seq((1L, "2024-01-01 00:05:00")).toDF("k", "t")
      .withColumn("t", col("t").cast("timestamp_ntz"))
    assert(Temporal.tumble(df, col("t"), Duration.hours(1)).count() == 1)
    assert(Temporal.slide(df, col("t"), Duration.hours(1), Duration.minutes(15)).count() == 4)
  }
}
