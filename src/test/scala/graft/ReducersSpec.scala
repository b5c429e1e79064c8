package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Reducers
import graft.sources.Tables

class ReducersSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import SparkTestBase.sfDir

  test("unique reducer errors on non-unique groups") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val ex = intercept[Exception] {
      df.groupBy("k").agg(Reducers.unique(col("v"))).collect()
    }
    assert(ex.getMessage.contains("non-unique") || ex.getCause != null)
  }

  test("unique reducer passes on unique groups") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "a"), (2, "c")).toDF("k", "v")
    val out = df.groupBy("k").agg(Reducers.unique(col("v")).as("v")).collect()
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSet == Set((1, "a"), (2, "c")))
  }

  test("statefulSingle aggregator: custom fold with map-side combine shape") {
    import spark.implicits._
    val agg = Reducers.statefulSingle[Long, (Long, Long), Double]((0L, 0L))(
      (s, x) => (s._1 + x, s._2 + 1))((a, b) => (a._1 + b._1, a._2 + b._2))(
      s => if (s._2 == 0) 0.0 else s._1.toDouble / s._2)
    val out = spark.range(1, 101).as[Long]
      .select(udaf(agg).apply(col("id")).as("mean")).head.getDouble(0)
    assert(out == 50.5)
  }

  test("approx_count_distinct is within rsd of exact") {
    val o = Tables.orders(spark, sfDir).df
    val exact = o.select(countDistinct(col("o_custkey"))).head.getLong(0)
    val approx = o.select(approx_count_distinct(col("o_custkey"), 0.02)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("earliest/latest pick by event time with deterministic tie-break") {
    import spark.implicits._
    val df = Seq((1L, 10L, 5L, 1.0), (1L, 10L, 6L, 2.0), (1L, 20L, 7L, 3.0))
      .toDF("k", "t", "id", "v")
    val r = df.groupBy("k").agg(
      Reducers.earliest(col("v"), col("t"), col("id")).as("e"),
      Reducers.latest(col("v"), col("t"), col("id")).as("l")).head
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 3.0)
  }

  test("topKFrequent: exact ranked heavy hitters, value tie-break") {
    import spark.implicits._
    import graft.operators.Utils
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d"))
      .map(("g", _)).toDF("g", "v")
    val got = Utils.topKFrequent(df, Seq(col("g")), col("v"), k = 3)
      .select("value", "cnt", "rank").as[(String, Long, Long)]
      .collect().sortBy(_._3).toSeq
    assert(got == Seq(("a", 5L, 1L), ("b", 3L, 2L), ("c", 3L, 3L)))
  }

  test("misraGries: coverage guarantee holds under any partitioning") {
    import spark.implicits._
    val n = 2000
    // 'hub' has freq 600 > n/(cap+1) = 2000/9 ≈ 222 → must survive; the
    // 1400 junk values are near-distinct noise
    val vals = Seq.fill(600)("hub") ++ (0 until 1400).map(i => s"junk${i % 700}")
    for (parts <- Seq(1, 4, 13)) {
      val df = scala.util.Random.shuffle(vals).map(("g", _)).toDF("g", "v")
        .repartition(parts)
      val m = df.groupBy("g").agg(Reducers.misraGries(col("v"), 8).as("mg"))
        .select("mg").as[Map[String, Long]].head()
      assert(m.size <= 8, s"capacity violated at parts=$parts: ${m.size}")
      assert(m.contains("hub"), s"heavy hitter lost at parts=$parts")
      // undercount bounded: est <= true, true - est <= n/(cap+1)
      assert(m("hub") <= 600L && 600L - m("hub") <= n / 9 + 1)
    }
  }

  test("countMin: partition-invariant cells, overestimate guarantee, mass conservation") {
    import spark.implicits._
    val (d, w) = (4, 16)
    val vals = Seq.fill(300)("hot") ++ (0 until 700).map(i => s"v${i % 150}")
    val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var first: Seq[Long] = null
    for (parts <- Seq(1, 4, 13)) {
      val df = scala.util.Random.shuffle(vals).map(("g", _)).toDF("g", "v")
        .repartition(parts)
      val sk = df.groupBy("g").agg(Reducers.countMin(col("v"), d, w).as("sk"))
      val cells = sk.select("sk").as[Seq[Long]].head()
      // cells are order-independent sums -> bit-identical at any partitioning
      if (first == null) first = cells else
        assert(cells == first, s"sketch differs at parts=$parts")
      // each row conserves total mass
      for (r <- 0 until d)
        assert(cells.slice(r * w, (r + 1) * w).sum == vals.size.toLong)
      // every estimate >= true count (the CMS one-sided guarantee), and the
      // estimate expression agrees with a driver-side min-over-rows replay
      val probes = exact.keys.toSeq.sorted
      val est = sk.select(explode(typedlit(probes)).as("v"), col("sk"))
        .select(col("v"),
          Reducers.countMinEstimate(col("sk"), col("v"), d, w).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for (v <- probes) {
        assert(est(v) >= exact(v), s"undercount for $v at parts=$parts")
        val h = graft.functions.CrossHash.md5LongJvm(v)
        val manual = (0 until d).map { r =>
          val (a, b) = graft.functions.CrossHash.mixers(r)
          cells(r * w + math.floorMod(h * a + b, w.toLong).toInt)
        }.min
        assert(est(v) == manual, s"expression/driver estimate mismatch for $v")
      }
    }
  }
}
