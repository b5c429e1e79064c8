package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.debug.Debug

/** Markdown fixture helper (FIXTURES.md §1): the reference's
  * table_from_markdown / assert_table_equality testing style. */
class DebugSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("tableFromMarkdown infers types, nulls, and the id key column") {
    val t = Debug.tableFromMarkdown(spark,
      """| id | age | owner | score | active |
        || 1  | 10  | Alice | 1.5   | true   |
        || 2  | 9   | Bob   | None  | false  |
        || 3  | 8   | Alice | 2.25  | true   |""".stripMargin)
    val df = t.toDf
    assert(df.schema("age").dataType.typeName == "long")
    assert(df.schema("score").dataType.typeName == "double")
    assert(df.schema("active").dataType.typeName == "boolean")
    assert(df.filter(col("score").isNull).count() == 1)
    // id-keyed: filter then set-op behaves on row identity
    val adults = t.filter(col("age") >= 9)
    assert(t.difference(adults).toDf.select("owner").as[String].collect().toSeq == Seq("Alice"))
  }

  test("tablesEqual is order-independent multiset equality") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((2L, "y"), (1L, "x")).toDF("k", "v")
    val c = Seq((1L, "x"), (1L, "x")).toDF("k", "v")
    assert(Debug.tablesEqual(a, b))
    assert(!Debug.tablesEqual(a, c))
  }

  test("operator semantics pinned with markdown fixtures (groupby+reduce)") {
    val t = Debug.tableFromMarkdown(spark,
      """| owner | pet |
        || Alice | dog |
        || Bob   | dog |
        || Alice | cat |""".stripMargin)
    val got = t.groupbyCols("owner").reduce("n" -> count(lit(1))).toDf
    val want = Seq(("Alice", 2L), ("Bob", 1L)).toDF("owner", "n")
    assert(Debug.tablesEqual(got, want))
  }

  test("test_stream_generator_from_markdown: _time batches replay to the " +
      "full table when nothing retracts") {
    val t = Debug.streamTableFromMarkdown(spark,
      """   | colA | colB | _time
        | 1 | 1    | 2    | 2
        | 5 | 2    | 3    | 4
        |10 | 5    | 1    | 8""".stripMargin)
    val want = Debug.tableFromMarkdown(spark,
      """   | colA | colB
        | 1 | 1    | 2
        | 5 | 2    | 3
        |10 | 5    | 1""".stripMargin)
    assert(Debug.tablesEqual(t.toDf, want.toDf))
  }

  test("test_stream_generator_from_markdown_with_diffs: _diff=-1 retracts " +
      "the keyed row; the stream settles to the net-positive rows") {
    val t = Debug.streamTableFromMarkdown(spark,
      """   | colA | colB | _time | _diff
        | 1 | 1    | 2    | 2     | 1
        | 5 | 2    | 3    | 2     | 1
        | 1 | 1    | 2    | 4     | -1
        |10 | 5    | 1    | 4     | 1
        | 3 | 1    | 1    | 4     | 1
        |10 | 5    | 1    | 8     | -1""".stripMargin)
    val want = Debug.tableFromMarkdown(spark,
      """   | colA | colB
        | 5 | 2    | 3
        | 3 | 1    | 1""".stripMargin)
    assert(Debug.tablesEqual(t.toDf, want.toDf))
    // the raw event form keeps the control columns for replay feeding
    val ev = Debug.streamEventsFromMarkdown(spark,
      """   | colA | _time
        | 1 | 7    | 2""".stripMargin)
    assert(ev.columns.toSet == Set("id", "colA", "_time", "_diff"))
    assert(ev.select("_diff").collect().head.getLong(0) == 1L)
  }

  test("stream markdown guards (r19 advice): an unkeyed grid and a net diff " +
      "outside {0,1} fail loudly up front, not deep in the fold") {
    val e1 = intercept[IllegalArgumentException](Debug.streamTableFromMarkdown(spark,
      """owner | _time
        |Alice | 2""".stripMargin))
    assert(e1.getMessage.contains("keyed grid"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](Debug.streamTableFromMarkdown(spark,
      """   | colA | _time
        | 1 | 7    | 2
        | 1 | 7    | 4""".stripMargin))
    assert(e2.getMessage.contains("duplicate-key insert"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](Debug.streamTableFromMarkdown(spark,
      """   | colA | _time | _diff
        | 1 | 7    | 2     | -1""".stripMargin))
    assert(e3.getMessage.contains("retract without"), e3.getMessage)
  }
}
