package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Bucketing

/** Co-located joins: two tables bucketed on the join key join without any
  * shuffle exchange — the persisted-partitioning path for repeated
  * big-to-big joins at scale. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("join of two same-bucketed tables plans with no shuffle exchange") {
    val base = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    val left = (0L until 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (0L until 1000L).map(i => (i, i * 2.0)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", s"$base/l", buckets = 8, keys = Seq("k"))
    Bucketing.writeBucketed(right, "bkt_right", s"$base/r", buckets = 8, keys = Seq("k"))
    try {
      val joined = Bucketing.table(spark, "bkt_left")
        .join(Bucketing.table(spark, "bkt_right"), "k")
      assert(joined.count() == 1000)
      assert(!Bucketing.hasShuffle(joined),
        "bucketed join must not shuffle:\n" + joined.queryExecution.executedPlan)

      // the same join over plain parquet DOES shuffle (or broadcasts) — the
      // bucketed layout is what removed the exchange, not the data size
      val plainL = left.repartition(4)
      val plainR = right.repartition(4)
      val plain = plainL.join(plainR, "k")
      val plan = plain.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange") || plan.contains("Broadcast"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
