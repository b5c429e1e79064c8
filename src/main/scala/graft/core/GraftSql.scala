package graft.core

import org.apache.spark.sql.{DataFrame, GraftExprBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Cast, Divide, EqualTo, Expression, IntegralDivide, Literal, NamedExpression, Remainder}
import org.apache.spark.sql.catalyst.parser.ParseException
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftOuter, RightOuter, UsingJoin}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Command, Join, LogicalPlan, ParsedStatement, Project}
import org.apache.spark.sql.types._
import graft.functions.PyArithOp

/** pw.sql bridge — the reference's SQL dialect lowered onto Spark SQL
  * (r16 decode of tests/test_sql.py against internals/sql/processing.py).
  *
  * The base layer is Spark's native parser/analyzer (register temp views, run
  * the query through Catalyst), which is strictly MORE complete than the
  * reference's sqlglot subset (ORDER BY, LIMIT, window functions and
  * subqueries anywhere all work here where `_run` raises NotImplementedError,
  * processing.py:43). On top of it, four dialect rules replicate what the
  * reference computes DIFFERENTLY from stock Spark SQL:
  *
  *  1. arithmetic — `/`, `DIV`, `%` lower onto the reference's typed
  *     operators (processing.py:212/217/234 map them to python `/`, `//`,
  *     `%`, decoded in r16 as [[graft.functions.PyArithOp]]): `/` is always
  *     float, `DIV` floor-divides (Spark's `div` truncates toward zero), `%`
  *     takes the DIVISOR's sign (Spark keeps the dividend's), and all three
  *     raise "division by zero" where non-ANSI Spark silently returns null;
  *  2. numeric literals — int if the text parses as int, else FLOAT
  *     (processing.py:191); the reference has no decimal type, so `1.5`
  *     must not become Spark's decimal(2,1);
  *  3. clause order — sqlglot collects top-level WHERE / GROUP BY / HAVING
  *     clauses in ANY textual order (test_sql.py:383 runs
  *     `GROUP BY a WHERE … HAVING …`); on a ParseException we canonicalize
  *     the clause order once and re-parse;
  *  4. equi-join unification — a JOIN … ON conjunction of plain same-name
  *     column equalities behaves like USING: the on-columns unify into one
  *     output column reachable unqualified (the reference promotes such on
  *     pairs, processing.py:386 `_test`), which is exactly Spark's UsingJoin.
  *
  * Unaliased computed select entries are auto-named `_col_<i>` like the
  * reference's positional `select(*args)` naming. Non-query statements
  * (CREATE TABLE …) raise like the reference's NotImplementedError
  * (test_sql.py:754) — a statement bridge that silently executed DDL would
  * be a correctness hazard. ORDER BY / LIMIT are a documented SUPERSET: the
  * reference rejects them, Spark runs them.
  */
object GraftSql {

  /** `sql("SELECT … FROM t1 JOIN t2 …", "t1" -> df1, "t2" -> df2)` */
  def sql(spark: SparkSession, query: String, tables: (String, DataFrame)*): DataFrame = {
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    pwSql(spark, query)
  }

  def sql(query: String, tables: (String, PwTable)*): PwTable = {
    require(tables.nonEmpty, "need at least one table")
    val spark = tables.head._2.spark
    tables.foreach { case (name, t) => t.toDf.createOrReplaceTempView(name) }
    PwTable.fromAllColumns(pwSql(spark, query))
  }

  /** Parse with the dialect tolerances, rewrite, analyze, rewrite arithmetic. */
  private[graft] def pwSql(spark: SparkSession, query: String): DataFrame = {
    val parsed =
      try GraftExprBridge.parsePlan(spark, query)
      catch {
        case e: ParseException =>
          val reordered = reorderClauses(query)
          if (reordered == query) throw e
          GraftExprBridge.parsePlan(spark, reordered)
      }
    parsed match {
      // Command covers DDL; ParsedStatement covers INSERT INTO & co. —
      // a statement bridge that silently executed writes would be a
      // correctness hazard (the reference raises NotImplementedError)
      case _: Command | _: ParsedStatement => throw new UnsupportedOperationException(
        s"${query.trim.takeWhile(_ != ' ')} not supported.")
      case _ =>
    }
    val dialect = floatLiterals(usingJoins(autoNamed(parsed)))
    val analyzed = GraftExprBridge.analyzedPlan(GraftExprBridge.ofRows(spark, dialect))
    GraftExprBridge.ofRows(spark, pyArithmetic(analyzed))
  }

  // ---- rule 1: / DIV % → reference arithmetic (post-analysis) ----

  /** Strips the analyzer's fractional→long cast under DIV so float `//`
    * keeps the reference's float floor-div route instead of long-truncating. */
  private def unLong(e: Expression): Expression = e match {
    case c: Cast if c.dataType == LongType && c.child.resolved &&
      (c.child.dataType == DoubleType || c.child.dataType == FloatType) => c.child
    case other => other
  }
  private def plain(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType => true
    case _ => false
  }
  private def pyArithmetic(plan: LogicalPlan): LogicalPlan =
    plan transformAllExpressionsWithSubqueries {
    case Divide(l, r, _) if plain(l.dataType) && plain(r.dataType) =>
      PyArithOp(l, r, "truediv")
    case IntegralDivide(l, r, _) if plain(unLong(l).dataType) && plain(unLong(r).dataType) =>
      PyArithOp(unLong(l), unLong(r), "floordiv")
    case Remainder(l, r, _) if plain(l.dataType) && plain(r.dataType) =>
      PyArithOp(l, r, "mod")
  }

  // ---- rule 2: decimal literals are reference floats ----

  private def floatLiterals(plan: LogicalPlan): LogicalPlan =
    plan transformAllExpressionsWithSubqueries {
    case Literal(d: Decimal, _: DecimalType) => Literal(d.toDouble, DoubleType)
  }

  // ---- rule 4: same-name equality ON conjunctions unify like USING ----

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }
  private val usingPromotable: Set[org.apache.spark.sql.catalyst.plans.JoinType] =
    Set(Inner, LeftOuter, RightOuter, FullOuter)
  private def usingJoins(plan: LogicalPlan): LogicalPlan = plan transformWithSubqueries {
    case j @ Join(_, _, jt, Some(cond), _) if usingPromotable(jt) =>
      val names = conjuncts(cond).map {
        case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.length == 2 && b.nameParts.length == 2 &&
             a.nameParts.last == b.nameParts.last &&
             a.nameParts.head != b.nameParts.head =>
          Some(a.nameParts.last)
        case _ => None
      }
      if (names.nonEmpty && names.forall(_.isDefined))
        j.copy(joinType = UsingJoin(j.joinType, names.flatten.toList), condition = None)
      else j
  }

  // ---- reference auto-naming: unaliased computed entries → _col_<i> ----

  private def autoName(list: Seq[NamedExpression]): Seq[NamedExpression] = {
    var i = -1
    list.map {
      case ua: UnresolvedAlias => ua.child match {
        case _: UnresolvedAttribute | _: UnresolvedStar => ua
        case c => i += 1; Alias(c, s"_col_$i")()
      }
      case other => other
    }
  }
  private def autoNamed(plan: LogicalPlan): LogicalPlan = plan transformWithSubqueries {
    case p: Project => p.copy(projectList = autoName(p.projectList))
    case a: Aggregate => a.copy(aggregateExpressions = autoName(a.aggregateExpressions))
  }

  // ---- rule 3: top-level WHERE / GROUP BY / HAVING in any textual order ----

  /** A copy of the query where quoted strings and paren bodies are blanked,
    * so clause keywords can be located at top level with a plain regex. */
  private def topLevelMask(q: String): String = {
    val sb = new StringBuilder(q)
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (quote != 0) {
        if (c == quote) quote = 0
        sb.setCharAt(i, ' ')
      } else c match {
        case '\'' | '"' | '`' => quote = c; sb.setCharAt(i, ' ')
        case '(' => depth += 1; sb.setCharAt(i, ' ')
        case ')' => depth = math.max(0, depth - 1); sb.setCharAt(i, ' ')
        case _ => if (depth > 0) sb.setCharAt(i, ' ')
      }
      i += 1
    }
    sb.toString
  }

  private val ClauseRe =
    """(?i)\b(WHERE|GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT|UNION|INTERSECT|EXCEPT|WINDOW)\b""".r

  /** sqlglot accepts SELECT clauses in any order (the reference's own fixture
    * runs `GROUP BY a WHERE … HAVING …`); Spark's parser does not. Rebuild
    * the query with the canonical WHERE < GROUP BY < HAVING order. Only
    * invoked as a ParseException fallback, so the happy path never scans. */
  private[graft] def reorderClauses(q: String): String = {
    val mask = topLevelMask(q)
    val hits = ClauseRe.findAllMatchIn(mask).toList
    val kinds = hits.map(_.group(1).toUpperCase.replaceAll("\\s+", " "))
    val starts = hits.map(_.start)
    // clause segment = [start, next top-level keyword or end)
    val ends = starts.drop(1) :+ q.length
    val segs = kinds.lazyZip(starts).lazyZip(ends).toList
    val movable = Set("WHERE", "GROUP BY", "HAVING")
    val head = segs.takeWhile { case (k, _, _) => movable(k) }
    if (head.size < 2) return q
    val order = Map("WHERE" -> 0, "GROUP BY" -> 1, "HAVING" -> 2)
    val sortedHead = head.sortBy { case (k, _, _) => order(k) }
    if (sortedHead == head) return q
    val prefix = q.substring(0, head.head._2)
    val suffix = q.substring(head.last._3)
    val body = sortedHead.map { case (_, s, e) => q.substring(s, e).trim }.mkString(" ")
    s"$prefix$body $suffix"
  }
}
