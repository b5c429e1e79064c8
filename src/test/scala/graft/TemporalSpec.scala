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

  test("asof nearest: tie prefers backward") {
    import spark.implicits._
    val l = Seq((1L, "2024-01-01 00:20:00")).toDF("k", "t")
      .withColumn("t", col("t").cast("timestamp_ntz"))
    val r = Seq((1L, "2024-01-01 00:10:00", 100), (1L, "2024-01-01 00:30:00", 200))
      .toDF("k", "rt", "v").withColumn("rt", col("rt").cast("timestamp_ntz"))
    val out = Temporal.asofNearest(l, r, "t", "rt", "k", "k",
      Seq("v" -> col("v"))).select("v").head.getInt(0)
    assert(out == 100) // equidistant → backward pinned
  }

  test("sessionize: strict gap boundary") {
    import spark.implicits._
    val df = Seq((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:30:00"),
      (1L, "2024-01-01 01:00:01"), (2L, "2024-01-01 00:00:00"))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp_ntz"))
    val sess = Temporal.sessionize(df, col("t"), Duration.minutes(30), Seq(col("k")))
    val n = sess.select("k", "_sid").distinct().count()
    // user1: rows at 0 and 30min merge (gap == 30min not > 30min); 1:00:01 splits
    assert(n == 3)
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
