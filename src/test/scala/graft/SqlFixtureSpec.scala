package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftSql

/** Replays the reference's pw.sql fixtures (tests/test_sql.py) against the
  * GraftSql dialect layer: sqlglot clause-order tolerance, reference
  * arithmetic (`/` always float, DIV = floor, % = divisor sign, division by
  * zero raises), int-else-float literals (no decimals), same-name ON
  * equality unifying like USING, `_col_<i>` auto-naming, and the
  * query-statements-only contract. ORDER BY / LIMIT / scalar subqueries are
  * a documented SUPERSET (the reference raises NotImplementedError,
  * internals/sql/processing.py:43). */
class SqlFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ab: DataFrame = Seq((2L, 3L), (5L, 6L)).toDF("a", "b")

  private def run(q: String, tables: (String, DataFrame)*): DataFrame =
    GraftSql.sql(spark, q, tables: _*)

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toList: Seq[Any]).toSet

  private def check(df: DataFrame, cols: Seq[String], expected: Set[Seq[Any]]): Unit = {
    assert(df.columns.toSeq == cols)
    assert(rows(df) == expected)
  }

  test("test_select_1 / test_dot / test_table_alias: plain and qualified column selects") {
    check(run("SELECT a FROM tab", "tab" -> ab), Seq("a"), Set(Seq(2L), Seq(5L)))
    check(run("SELECT tab.a FROM tab", "tab" -> ab), Seq("a"), Set(Seq(2L), Seq(5L)))
    check(run("SELECT t1.a FROM tab t1", "tab" -> ab), Seq("a"), Set(Seq(2L), Seq(5L)))
  }

  test("test_select_2: expressions, int literal stays int") {
    check(run("SELECT a, b, 1 as c, a+b+1 as d FROM tab", "tab" -> ab),
      Seq("a", "b", "c", "d"),
      Set(Seq(2L, 3L, 1, 6L), Seq(5L, 6L, 1, 12L)))
  }

  test("test_where: predicate and NOT") {
    val tab = Seq((1L, 3L), (2L, 4L), (5L, 2L)).toDF("a", "b")
    check(run("SELECT a, b FROM tab WHERE a>b", "tab" -> tab),
      Seq("a", "b"), Set(Seq(5L, 2L)))
    check(run("SELECT a, b FROM tab WHERE NOT (a>b)", "tab" -> tab),
      Seq("a", "b"), Set(Seq(1L, 3L), Seq(2L, 4L)))
  }

  test("test_star / test_tab_star / test_nested(+stars): identity selects") {
    check(run("SELECT * FROM tab", "tab" -> ab), Seq("a", "b"), rows(ab))
    check(run("SELECT tab.* FROM tab", "tab" -> ab), Seq("a", "b"), rows(ab))
    check(run("SELECT a FROM (SELECT * FROM tab)", "tab" -> ab), Seq("a"), Set(Seq(2L), Seq(5L)))
    check(run("SELECT * FROM (SELECT * FROM tab)", "tab" -> ab), Seq("a", "b"), rows(ab))
  }

  test("test_with: CTE chains compose") {
    check(run(
      "WITH foo AS (SELECT a+1 AS a, b+1 AS b FROM tab) SELECT a+1 AS a, b+1 AS b FROM foo",
      "tab" -> ab), Seq("a", "b"), Set(Seq(4L, 5L), Seq(7L, 8L)))
  }

  private def xyz: DataFrame =
    Seq(("x", 5L), ("x", 6L), ("y", 7L), ("y", 8L), ("z", 9L), ("z", 10L), ("z", 11L))
      .toDF("a", "b")

  test("test_groupby / test_where_groupby") {
    check(run("SELECT a, SUM(b) as col1, COUNT(*) as col2 FROM tab GROUP BY a",
        "tab" -> xyz.filter($"b" < 9)),
      Seq("a", "col1", "col2"), Set(Seq("x", 11L, 2L), Seq("y", 15L, 2L)))
    check(run("SELECT a, SUM(b) as col1, COUNT(*) as col2 FROM tab WHERE b<9 GROUP BY a",
        "tab" -> xyz),
      Seq("a", "col1", "col2"), Set(Seq("x", 11L, 2L), Seq("y", 15L, 2L)))
  }

  test("test_having / test_where_having: HAVING may precede GROUP BY (sqlglot clause order)") {
    check(run("SELECT a, SUM(b) as col1, COUNT(*) as col2 FROM tab HAVING COUNT(*)<3 GROUP BY a",
        "tab" -> xyz),
      Seq("a", "col1", "col2"), Set(Seq("x", 11L, 2L), Seq("y", 15L, 2L)))
    check(run(
        "SELECT a, SUM(b) as col1, COUNT(*) as col2 FROM tab WHERE b<11 HAVING COUNT(*)<3 GROUP BY a",
        "tab" -> xyz),
      Seq("a", "col1", "col2"),
      Set(Seq("x", 11L, 2L), Seq("y", 15L, 2L), Seq("z", 19L, 2L)))
  }

  test("test_bare_sum: implicit global reduce") {
    val tab = Seq(5L, 6L, 7L, 8L, 9L, 10L, 11L).toDF("col")
    check(run("SELECT SUM(col) as sumcol FROM tab", "tab" -> tab),
      Seq("sumcol"), Set(Seq(56L)))
  }

  private def t1: DataFrame = Seq(("x", 11L), ("y", 12L)).toDF("a", "b")
  private def t2: DataFrame = Seq(("x", 13L), ("y", 14L)).toDF("c", "d")

  test("test_implicit_join / test_explicit_join: comma and bare JOIN are cross joins") {
    val expected = Set(
      Seq("x", 11L, "x", 13L), Seq("x", 11L, "y", 14L),
      Seq("y", 12L, "x", 13L), Seq("y", 12L, "y", 14L))
    check(run("SELECT * FROM tab1, tab2", "tab1" -> t1, "tab2" -> t2),
      Seq("a", "b", "c", "d"), expected)
    check(run("SELECT * FROM tab1 JOIN tab2", "tab1" -> t1, "tab2" -> t2),
      Seq("a", "b", "c", "d"), expected)
    check(run("SELECT * FROM (tab1 JOIN tab2)", "tab1" -> t1, "tab2" -> t2),
      Seq("a", "b", "c", "d"), expected)
  }

  test("test_implicit_join_where / test_join_on: different-name ON keeps both columns") {
    val expected = Set(Seq("x", 11L, "x", 13L), Seq("y", 12L, "y", 14L))
    check(run("SELECT * FROM tab1, tab2 WHERE tab1.a=tab2.c", "tab1" -> t1, "tab2" -> t2),
      Seq("a", "b", "c", "d"), expected)
    check(run("SELECT * FROM tab1 JOIN tab2 ON tab1.a=tab2.c", "tab1" -> t1, "tab2" -> t2),
      Seq("a", "b", "c", "d"), expected)
  }

  test("test_join_using: USING unifies the join column") {
    val t2a = Seq(("x", 13L), ("y", 14L)).toDF("a", "d")
    check(run("SELECT * FROM tab1 JOIN tab2 USING(a)", "tab1" -> t1, "tab2" -> t2a),
      Seq("a", "b", "d"), Set(Seq("x", 11L, 13L), Seq("y", 12L, 14L)))
  }

  test("test_surprising_selfjoin / test_implicit_selfjoin") {
    check(run("SELECT tab1.a AS t1a, tab2.a AS t2a FROM tab1, tab2",
        "tab1" -> t1, "tab2" -> t1),
      Seq("t1a", "t2a"),
      Set(Seq("x", "x"), Seq("x", "y"), Seq("y", "x"), Seq("y", "y")))
    check(run("SELECT t1.a, t2.b FROM tab t1, tab t2", "tab" -> t1),
      Seq("a", "b"),
      Set(Seq("x", 11L), Seq("x", 12L), Seq("y", 11L), Seq("y", 12L)))
  }

  test("test_join_where_groupby: scrambled clause order + same-name ON unification") {
    val j1 = Seq(("x", 11L), ("x", 12L), ("x", 13L), ("y", 14L), ("y", 15L), ("y", 16L))
      .toDF("a", "b")
    val j2 = Seq(("x", 11L), ("x", 12L), ("x", 13L), ("y", 14L), ("y", 15L), ("y", 16L))
      .toDF("a", "c")
    val df = run(
      """SELECT SUM(b*c) as col
         FROM tab1 JOIN tab2 ON tab1.a=tab2.a
         GROUP BY a
         WHERE tab1.b > tab2.c
         HAVING tab1.a == 'x'""",
      "tab1" -> j1, "tab2" -> j2)
    check(df, Seq("col"), Set(Seq(13L * 11 + 13 * 12 + 12 * 11)))
  }

  test("test_union: UNION dedups, UNION ALL concatenates") {
    val u1 = Seq(("x", 11L), ("y", 12L), ("z", 13L)).toDF("a", "b")
    val u2 = Seq(("y", 12L), ("z", 13L), ("v", 14L)).toDF("a", "b")
    check(run("SELECT * FROM tab1 UNION SELECT * FROM tab2", "tab1" -> u1, "tab2" -> u2),
      Seq("a", "b"),
      Set(Seq("x", 11L), Seq("y", 12L), Seq("z", 13L), Seq("v", 14L)))
    val all = run("SELECT * FROM tab1 UNION ALL SELECT * FROM tab2", "tab1" -> u1, "tab2" -> u2)
    assert(all.count() == 6)
    assert(rows(all) == Set(Seq("x", 11L), Seq("y", 12L), Seq("z", 13L), Seq("v", 14L)))
  }

  test("test_intersect: set semantics over full rows (duplicates collapse)") {
    val i1 = Seq(("x", 11L), ("x", 11L), ("y", 12L), ("z", 13L), ("z", 13L)).toDF("a", "b")
    val i2 = Seq(("y", 12L), ("z", 13L), ("v", 14L)).toDF("a", "b")
    check(run("SELECT * FROM tab1 INTERSECT SELECT * FROM tab2", "tab1" -> i1, "tab2" -> i2),
      Seq("a", "b"), Set(Seq("y", 12L), Seq("z", 13L)))
  }

  test("test_advanced_subquery_avg / test_subquery_having: scalar subqueries") {
    val tab = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")).toDF("val", "name")
    check(run("SELECT * FROM tab WHERE val > (SELECT AVG(val) FROM tab)", "tab" -> tab),
      Seq("val", "name"), Set(Seq(4L, "d"), Seq(5L, "e")))
    val g = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 2L))
      .toDF("val", "group")
    check(run(
        "SELECT SUM(val) as sum FROM tab GROUP BY group HAVING group = (SELECT MAX(group) FROM tab)",
        "tab" -> g),
      Seq("sum"), Set(Seq(15L)))
  }

  test("test_case: CASE WHEN chains") {
    val tab = Seq(0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L).toDF("col")
    val df = run(
      "SELECT CASE WHEN col=0 THEN 10 WHEN col=1 THEN 11 ELSE 12 END AS col FROM tab",
      "tab" -> tab)
    assert(df.columns.toSeq == Seq("col"))
    assert(df.collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(10, 10, 11, 11, 12, 12, 12, 12))
  }

  test("test_notimplemented: statements are rejected; ORDER BY is a documented superset") {
    val e = intercept[UnsupportedOperationException] {
      run("CREATE TABLE Persons (PersonID int)", "tab" -> ab)
    }
    assert(e.getMessage.contains("not supported"))
    // the reference raises NotImplementedError on ORDER BY; we run it (superset)
    val ordered = run("SELECT a, b FROM tab ORDER BY a DESC", "tab" -> ab)
    assert(ordered.collect().map(_.getLong(0)).toSeq == Seq(5L, 2L))
    // INSERT parses to a ParsedStatement, not a Command — still rejected
    // (review pin: a silent write through the bridge)
    val ins = intercept[UnsupportedOperationException] {
      run("INSERT INTO tab VALUES (9, 9)", "tab" -> ab)
    }
    assert(ins.getMessage.contains("not supported"))
  }

  test("dialect rules reach INSIDE subqueries (review pin)") {
    // % inside a scalar subquery is still floor-signed: -7 % 5 = 3 (Spark: -2)
    val tab = Seq(1L, 2L, 3L, 4L).toDF("a")
    check(run("SELECT a FROM tab WHERE a > (SELECT -7 % 5)", "tab" -> tab),
      Seq("a"), Set(Seq(4L)))
    // decimal-looking literal inside a subquery is a float too
    val df = run("SELECT (SELECT 1.5) AS d FROM tab LIMIT 1", "tab" -> tab)
    assert(df.schema("d").dataType.typeName == "double")
  }

  test("scrambled clauses followed by ORDER BY re-parse with a separator (review pin)") {
    val df = run(
      "SELECT a, SUM(b) as s FROM tab HAVING COUNT(*) >= 1 GROUP BY a ORDER BY a DESC",
      "tab" -> ab)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((5L, 6L), (2L, 3L)))
  }

  test("same-name ON unification works for LEFT JOIN too (review pin)") {
    val l = Seq(("x", 11L), ("y", 12L), ("w", 13L)).toDF("a", "b")
    val r = Seq(("x", 21L), ("y", 22L)).toDF("a", "d")
    val df = run("SELECT a, b, d FROM tab1 LEFT JOIN tab2 ON tab1.a = tab2.a",
      "tab1" -> l, "tab2" -> r)
    assert(rows(df) == Set(
      Seq("x", 11L, 21L), Seq("y", 12L, 22L), Seq("w", 13L, null)))
  }

  test("test_add / test_sub / comparison operators (incl. ==, !=)") {
    val tab = Seq((10L, 1L), (20L, 2L)).toDF("a", "b")
    check(run("SELECT a+b as c FROM tab", "tab" -> tab), Seq("c"), Set(Seq(11L), Seq(22L)))
    check(run("SELECT a-b as c FROM tab", "tab" -> tab), Seq("c"), Set(Seq(9L), Seq(18L)))
    val cmp = Seq((10L, 3L), (20L, 20L)).toDF("a", "b")
    for ((op, ex) <- Seq(
        "==" -> Set(Seq[Any](10L, false), Seq[Any](20L, true)),
        "!=" -> Set(Seq[Any](10L, true), Seq[Any](20L, false)),
        ">=" -> Set(Seq[Any](10L, true), Seq[Any](20L, true)),
        ">" -> Set(Seq[Any](10L, true), Seq[Any](20L, false)),
        "<=" -> Set(Seq[Any](10L, false), Seq[Any](20L, true)),
        "<" -> Set(Seq[Any](10L, false), Seq[Any](20L, false)))) {
      check(run(s"SELECT a, a $op b as c FROM tab", "tab" -> cmp), Seq("a", "c"), ex)
    }
  }

  test("test_float_div: / is always float and raises on zero") {
    val tab = Seq((10L, 1L), (20L, 2L)).toDF("a", "b")
    check(run("SELECT a/b as c FROM tab", "tab" -> tab), Seq("c"),
      Set(Seq(10.0d), Seq(10.0d)))
    val zero = Seq((1L, 0L)).toDF("a", "b")
    val e = intercept[Exception] { run("SELECT a/b as c FROM tab", "tab" -> zero).collect() }
    assert(SparkTestBase.causeMessages(e).exists(_.contains("division by zero")))
  }

  test("test_int_div: DIV floor-divides (reference //), not Spark trunc") {
    val tab = Seq((10L, 1L), (20L, 2L), (-7L, 2L), (7L, -2L)).toDF("a", "b")
    check(run("SELECT a, a DIV b as c FROM tab", "tab" -> tab), Seq("a", "c"),
      Set(Seq(10L, 10L), Seq(20L, 10L), Seq(-7L, -4L), Seq(7L, -4L)))
    val zero = Seq((1L, 0L)).toDF("a", "b")
    val e = intercept[Exception] { run("SELECT a DIV b as c FROM tab", "tab" -> zero).collect() }
    assert(SparkTestBase.causeMessages(e).exists(_.contains("division by zero")))
  }

  test("test_mod: % takes the divisor's sign (reference mod_floor), not Spark's dividend sign") {
    val tab = Seq((10L, 3L), (20L, 3L), (-7L, 2L), (7L, -2L)).toDF("a", "b")
    check(run("SELECT a, a % b as c FROM tab", "tab" -> tab), Seq("a", "c"),
      Set(Seq(10L, 1L), Seq(20L, 2L), Seq(-7L, 1L), Seq(7L, -1L)))
  }

  test("decimal-looking literals are reference floats (processing.py:191), not decimals") {
    val df = run("SELECT a + 0.5 AS c, 1.5 AS d FROM tab", "tab" -> ab)
    assert(df.schema("c").dataType.typeName == "double")
    assert(df.schema("d").dataType.typeName == "double")
    assert(rows(df) == Set(Seq(2.5d, 1.5d), Seq(5.5d, 1.5d)))
  }

  test("test_aliases_1/2: alias scoping matches (inner alias hides the original name)") {
    val named = Seq(1L, 2L, 3L).toDF("name")
    intercept[Exception] {
      run("select name from (select name as n from t)", "t" -> named).collect()
    }
    check(run("select n from (select name as n from t) as t", "t" -> named),
      Seq("n"), Set(Seq(1L), Seq(2L), Seq(3L)))
    // test_aliases_3 divergence (documented, SEMANTICS.md): the reference
    // resolves `t1.name` THROUGH a subquery alias because its subquery shares
    // t1's universe (same-universe column access); SQL scoping — Spark's and
    // everyone else's — hides t1 behind the alias, so this is an analysis
    // error here rather than a silent different answer.
    intercept[Exception] {
      run("select t1.name as n from (select name as nn from t1) as t2", "t1" -> named)
        .collect()
    }
  }

  test("unaliased computed entries auto-name _col_<i> like the reference select(*args)") {
    val df = run("SELECT a, a+b, COUNT(*) FROM tab GROUP BY a, a+b", "tab" -> ab)
    assert(df.columns.toSeq == Seq("a", "_col_0", "_col_1"))
    val df2 = run("SELECT COUNT(*) FROM tab", "tab" -> ab)
    assert(df2.columns.toSeq == Seq("_col_0"))
    assert(df2.collect().head.getLong(0) == 2L)
  }

  test("sql_dialect board row: scrambled clauses + floor DIV/% match the DuckDB oracle") {
    // oracle values computed by DuckDB on the same parquet with the floor
    // formulas spelled out (its native // and % are C-style)
    val df = SparkEntry.queries("sql_dialect")(spark, SparkTestBase.sfDir)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1).toList
    assert(got == List(
      ("A", 1962L, -793L, 5842L, 770.953125),
      ("N", 2070L, -693L, 6271L, 830.78125),
      ("R", 1968L, -764L, 5894L, 777.28125)))
  }

  test("test_sql_interview_Q1 (trailing semicolon) and Q7_bis (BETWEEN on strings)") {
    val emp = Seq(("Sanjay", "HR"), ("Ananya", "Admin")).toDF("EmpFname", "Department")
    check(run("SELECT EmpFname AS EmpName FROM EmployeeInfo;", "EmployeeInfo" -> emp),
      Seq("EmpName"), Set(Seq("Sanjay"), Seq("Ananya")))
    // string BETWEEN is LEXICOGRAPHIC in both engines: '75000' <= '100000'
    // is false ('7' > '1'), so the reference's own expected set is empty too
    val pos = Seq(("Manager", "500000"), ("Executive", "75000"), ("Lead", "85000"))
      .toDF("EmpPosition", "Salary")
    check(run(
        "SELECT * FROM EmployeePosition WHERE Salary BETWEEN '50000' AND '100000';",
        "EmployeePosition" -> pos),
      Seq("EmpPosition", "Salary"), Set.empty)
    check(run(
        "SELECT * FROM EmployeePosition WHERE Salary BETWEEN '50000' AND '90000';",
        "EmployeePosition" -> pos),
      Seq("EmpPosition", "Salary"),
      Set(Seq("Manager", "500000"), Seq("Executive", "75000"), Seq("Lead", "85000")))
  }
}
