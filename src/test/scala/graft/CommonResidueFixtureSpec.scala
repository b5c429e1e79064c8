package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Keys, PwTable}

/** r17 sweep of the remaining `tests/test_common.py` residue — the segments
  * not covered by the earlier core-table / sequence-get / iterate-limit /
  * cast-coalesce decodes: global-reduce broadcasting, grouped ix_ref,
  * multi-ix composition, tuple (struct) comparison and tuple sort keys,
  * reducers over ix-fetched columns, and foreign-column groupby. Each test
  * replays the reference's literal vector.
  */
class CommonResidueFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("global reduce broadcasts its single row to every input row " +
      "(test_common.py test_broadcasting_singlerow)") {
    val table = Seq((1, "Alice", 10), (1, "Bob", 9), (2, "Alice", 8),
      (1, "Bob", 7), (0, "Eve", 10)).toDF("pet", "owner", "age")
    // reduce(val=1) with no groupby = the GLOBAL one-row table; ix_ref()
    // with no args addresses it from anywhere — a broadcast join in Spark
    val row = table.agg(lit(1).as("val"))
    val returned = table.crossJoin(broadcast(row)).select(col("val").as("newval"))
    assert(returned.as[Int].collect().toSeq == Seq(1, 1, 1, 1, 1))
  }

  test("grouped table is addressable by ix_ref on the grouping key " +
      "(test_common.py test_indexing_single_value_groupby)") {
    val rows = Seq((10, "A"), (20, "A"), (30, "B"), (40, "B"))
    val indexed = rows.toDF("colA", "colB")
    val t = PwTable.fromAllColumns(rows.toDF("colA", "colB"))
    val grouped = t.groupbyCols("colB").reduce("sum" -> sum(col("colA")))
    // ix_ref(colB) = pointer_from(colB) into the reduced universe, whose id
    // IS hash(grouping values) — resolved here as the equivalent equi-join
    // on the grouping key
    val out = indexed.join(grouped.toDf, Seq("colB")).select("colA", "colB", "sum")
    assert(out.as[(Int, String, Long)].collect().toSet ==
      Set((10, "A", 30L), (20, "A", 30L), (30, "B", 70L), (40, "B", 70L)))
  }

  test("two ix lookups with misses compose through intersect + restrict " +
      "(test_common.py test_multiple_ix)") {
    val indexed = Seq((2, "a"), (3, "b"), (4, "c"), (5, "d")).toDF("k", "col")
    val target = PwTable.fromPrimaryKey(indexed, "k")
    def lookup(keys: Seq[(Int, Int)], outName: String): PwTable = {
      // indexer rows keyed by their own id; ix with allow_misses → nulls
      val idx = PwTable.fromPrimaryKey(keys.toDF("rid", "key"), "rid")
      idx.ix(target.rename("k" -> "_tk", "col" -> outName),
          Keys.pointerFrom(col("key")), optional = true)
        .filter(col(outName).isNotNull)
    }
    val a = lookup(Seq((1, 4), (2, 3), (3, 2), (4, 1)), "col1")
    val b = lookup(Seq((1, 6), (2, 5), (3, 4), (4, 3)), "col2")
    val common = a.intersect(b)
    val joined = a.restrict(common).toDf.select("rid", "col1")
      .join(b.restrict(common).toDf.select("rid", "col2"), "rid")
      .select("col1", "col2")
    assert(joined.as[(String, String)].collect().toSet == Set(("a", "c"), ("b", "d")))
  }

  test("tuple (struct) comparison is lexicographic like python tuples " +
      "(test_common.py test_python_tuple_comparison)") {
    val t = Seq((1, 2), (4, 3), (5, 5)).toDF("a", "b")
    val l = struct(col("a"), col("b"))
    val r = struct(col("b"), col("a"))
    val got = t.select(
      (l < r).as("x"), (l < r).as("y"), (l > r).as("z"), (l > r).as("t"),
      (l === r).as("e"), (l =!= r).as("n"))
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
    assert(got == Seq(
      (true, true, false, false, false, true),
      (false, false, true, true, false, true),
      (false, false, false, false, true, false)))
  }

  test("sort with a tuple key threads prev pointers in (b, c) order " +
      "(test_common.py test_python_tuple_sorting)") {
    val rows = Seq((1, 3, 2), (2, 4, 1), (3, 3, 6), (4, 2, 8),
      (5, 5, 6), (6, 1, 4), (7, 2, 2), (8, 3, 3)).toDF("a", "b", "c")
    val t = PwTable.fromPrimaryKey(rows, "a")
    val s = t.sortWithPrevNext(Seq(col("b"), col("c")), lit(0)).df
    val prevA = s.select(col(Keys.IdCol).as("_pid"), col("a").as("prev_a"))
    val out = s.join(prevA, col("prev") === col("_pid"), "left")
      .select(col("a"), col("prev_a"))
    val got = out.collect().map(r =>
      r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got == Map(1 -> Some(4), 2 -> Some(3), 3 -> Some(8), 4 -> Some(7),
      5 -> Some(2), 6 -> None, 7 -> Some(6), 8 -> Some(1)))
  }

  test("reducers over an ix-fetched column = join then reduce " +
      "(test_common.py test_reducers_ix shape)") {
    val values = PwTable.fromPrimaryKey(
      Seq((1, 1), (2, 2), (3, 6), (4, 3), (5, 9)).toDF("vid", "v"), "vid")
    val t = Seq((1, 4), (2, 1), (3, 4), (4, 2), (5, 4), (6, 5), (7, 2))
      .toDF("rid", "ptr")
    val tt = PwTable.fromPrimaryKey(t, "rid")
      .withColumns("t" -> expr("CASE rid WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 3" +
        " WHEN 4 THEN 3 WHEN 5 THEN 2 WHEN 6 THEN 3 ELSE 1 END"))
    val fetched = tt.ix(values.rename("vid" -> "_vk"), Keys.pointerFrom(col("ptr")))
    val reduced = fetched.toDf.groupBy("t")
      .agg(sort_array(collect_list(col("v"))).as("vs"))
    val got = reduced.as[(Int, Seq[Int])].collect().toMap
    // t=1: rows rid 1,7 → ptr 4,2 → v 3,2 ; t=2: rid 2,5 → v 1,3 ;
    // t=3: rid 3,4,6 → v 3,2,9
    assert(got == Map(1 -> Seq(2, 3), 2 -> Seq(1, 3), 3 -> Seq(2, 3, 9)))
  }

  test("groupby over a pointer column reduces foreign tables consistently " +
      "(test_common.py test_groupby_foreign_column)") {
    val tab = Seq((0, 1), (0, 2), (1, 3), (1, 4), (2, 5), (2, 6))
      .toDF("grouper", "col")
    val keyed = PwTable.fromKeyed(
      tab.withColumn(Keys.IdCol, Keys.pointerFrom(col("grouper"))))
    // groupby(id=tab.grouper): the pointer is the result id on BOTH
    // reductions, so they stay addressable against each other by id
    val red1 = keyed.groupby("g" -> keyed.id)
      .reduceWithId("g", "col1" -> sum(col("col"))).df
      .select(col(Keys.IdCol), col("col1"))
    val red2 = keyed.groupby("g" -> keyed.id)
      .reduceWithId("g", "col2" -> sum(col("col"))).df
      .select(col(Keys.IdCol), col("col2"))
    val got = red1.join(red2, Keys.IdCol)
      .select((col("col1") + col("col2")).as("col"))
      .as[Long].collect().toSeq.sorted
    assert(got == Seq(6L, 14L, 22L))
  }
}
