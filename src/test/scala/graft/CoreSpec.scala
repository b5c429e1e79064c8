package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Keys, PwTable}
import graft.sources.Tables

class CoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import SparkTestBase.sfDir

  def customer = Tables.customer(spark, sfDir)
  def orders = Tables.orders(spark, sfDir)

  test("pointer ids are stable and derived from pk values, not layout") {
    val a = customer.df.select("_pw_id").collect().map(_.getLong(0)).sorted
    val b = PwTable.fromPrimaryKey(
      Tables.parquet(spark, sfDir, "customer").repartition(7), "c_custkey")
      .df.select("_pw_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("row-wise ops preserve the universe (ids unchanged)") {
    val base = customer
    val sel = base.select("x" -> col("c_acctbal") * 2).df.select("_pw_id")
    assert(sel.except(base.df.select("_pw_id")).isEmpty)
  }

  test("groupby/reduce keys the result by grouping values") {
    val g = orders.groupbyCols("o_orderstatus").reduce("n" -> count(lit(1)))
    val ids = g.df.select("_pw_id", "o_orderstatus").collect()
    ids.foreach { r =>
      val expect = g.df.sparkSession.range(1)
        .select(Keys.pointerFrom(lit(r.getString(1)))).head.getLong(0)
      assert(r.getLong(0) == expect)
    }
  }

  test("flatten derives id from (origin, position) and keeps other columns") {
    val t = PwTable.fromPrimaryKey(
      spark.createDataFrame(Seq((1L, Seq("a", "b")), (2L, Seq("c")))).toDF("k", "xs"), "k")
    val f = t.flatten("xs", withOrigin = true)
    assert(f.df.count() == 3)
    assert(f.columns.toSet == Set("xs", "k", "origin_id"))
    val distinctIds = f.df.select("_pw_id").distinct().count()
    assert(distinctIds == 3)
  }

  test("difference / intersect operate on ids") {
    val neg = customer.filter(col("c_acctbal") < 0)
    val pos = customer.difference(neg)
    assert(pos.df.count() + neg.df.count() == customer.df.count())
    assert(customer.intersect(neg).df.count() == neg.df.count())
  }

  test("update_cells overwrites only matching cells") {
    val patch = customer.filter(col("c_acctbal") < 0).withColumns("c_acctbal" -> lit(0.0))
    val out = customer.updateCells(patch)
    assert(out.df.filter(col("c_acctbal") < 0).count() == 0)
    assert(out.df.count() == customer.df.count())
  }

  test("update_rows upserts: other wins, union of key sets") {
    val repl = customer.filter(col("c_nationkey") === 1)
      .withColumns("c_mktsegment" -> lit("X"))
    val out = customer.updateRows(repl)
    assert(out.df.count() == customer.df.count())
    assert(out.df.filter(col("c_nationkey") === 1 && col("c_mktsegment") =!= "X").count() == 0)
  }

  test("concat_reindex assigns fresh ids; concat keeps originals") {
    val a = customer.filter(col("c_custkey") % 2 === 0)
    val b = customer.filter(col("c_custkey") % 2 === 1)
    val cc = a.concat(b)
    assert(cc.df.select("_pw_id").except(customer.df.select("_pw_id")).isEmpty)
    val cr = a.concatReindex(b)
    assert(cr.df.join(customer.df.select("_pw_id"), Seq("_pw_id"), "left_semi").count() == 0)
  }

  test("deduplicate keeps one row per instance by priority") {
    val d = orders.deduplicate(Seq(col("o_custkey")), col("o_totalprice"))
    val nCust = orders.df.select("o_custkey").distinct().count()
    assert(d.df.count() == nCust)
    // kept row has the max price of its group
    val mx = orders.df.groupBy("o_custkey").agg(max("o_totalprice").as("m"))
    val bad = d.df.join(mx, "o_custkey").filter(col("o_totalprice") =!= col("m"))
    assert(bad.count() == 0)
  }

  test("split partitions rows, null-safe") {
    val (hi, lo) = orders.split(col("o_totalprice") > 100000.0)
    assert(hi.df.count() + lo.df.count() == orders.df.count())
  }

  test("join derives id = hash(left_id, right_id)") {
    val j = orders.join(customer, col("l.o_custkey") === col("r.c_custkey"))
      .select("o_orderkey" -> col("l.o_orderkey"))
    assert(j.df.select("_pw_id").distinct().count() == j.df.count())
  }
}
