package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression}
import org.apache.spark.sql.types._

/** The reference's fully-async UDF dtype gate (udfs `fully_async_executor`,
  * internals/dtype.py Future wrapping; tests/test_udf.py:1069-1480).
  *
  * A fully-async UDF's output column has dtype `Future[T]`: it may be
  * carried through select/with_columns, consumed by ANOTHER fully-async UDF
  * (chaining), and stored — but using it inside any expression, reducer,
  * groupby key, sort key/instance, or deduplicate column is a TypeError
  * with the reference's exact message until `await_futures()` resolves the
  * table. Graft models the dtype as column METADATA (`pw.future` = the
  * python inner-type name) since execution here is synchronous by design
  * (SEMANTICS D10: async executors are a python-runtime property; the
  * ENGINE contract is the dtype gating, which this decodes verbatim) —
  * `awaitFutures()` strips the flag without recomputation.
  */
object Futures {
  val Flag = "pw.future"

  /** Spark 4's public Column hides its catalyst expression; the bridge
    * recovers it (resolved `df("name")` refs keep metadata). Function
    * applications convert LAZILY (an opaque ColumnNodeExpression leaf), so
    * gates that must see inside computations use [[analyzedExpr]] instead. */
  private def exprOf(c: Column): Expression =
    org.apache.spark.sql.GraftExprBridge.expression(c)

  /** The fully-resolved catalyst tree of `c` against `df`: analyze a
    * throwaway projection (plan-time only — nothing executes) so binary
    * ops/aggregates appear as real nodes with child types, and attribute
    * metadata survives analysis. */
  private def analyzedExpr(df: DataFrame, c: Column): Expression =
    scala.util.Try {
      org.apache.spark.sql.GraftExprBridge.analyzedPlan(df.select(c))
        .expressions.head
    }.getOrElse(exprOf(c))

  def metadataFor(innerPy: String): Metadata =
    new MetadataBuilder().putString(Flag, innerPy).build()

  def isFuture(f: StructField): Boolean = f.metadata.contains(Flag)

  def render(innerPy: String): String = s"_asyncio.Future[$innerPy]"

  /** Python rendering of a non-future column's type, for the binary-op
    * message ("<class 'int'>" etc. — test_udf.py:1145). */
  def pyName(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType => "<class 'int'>"
    case DoubleType | FloatType => "<class 'float'>"
    case StringType => "<class 'str'>"
    case BooleanType => "<class 'bool'>"
    case _: ArrayType => "<class 'list'>"
    case other => other.sql
  }

  /** Future-flagged attributes referenced by `c` (resolved refs only — the
    * PwTable API hands out resolved `table("name")` columns). Returns
    * (name, inner python type) pairs in reference order. */
  def futureRefs(c: Column): Seq[(String, String)] = futureRefs(exprOf(c))

  def futureRefs(e: Expression): Seq[(String, String)] =
    e.collect {
      case a: AttributeReference if a.metadata.contains(Flag) =>
        a.name -> a.metadata.getString(Flag)
    }.distinct


  private val binaryOpNames: Map[String, String] = Map(
    "Add" -> "add", "Subtract" -> "sub", "Multiply" -> "mul",
    "Divide" -> "truediv", "IntegralDivide" -> "floordiv",
    "Remainder" -> "mod", "Pmod" -> "mod",
    "EqualTo" -> "eq", "LessThan" -> "lt", "LessThanOrEqual" -> "le",
    "GreaterThan" -> "gt", "GreaterThanOrEqual" -> "ge",
    "And" -> "and", "Or" -> "or")

  /** Spark 4's Column API builds arithmetic as UnresolvedFunction("+", …). */
  private val fnOpNames: Map[String, String] = Map(
    "+" -> "add", "-" -> "sub", "*" -> "mul", "/" -> "truediv",
    "div" -> "floordiv", "%" -> "mod", "mod" -> "mod",
    "=" -> "eq", "==" -> "eq", "<" -> "lt", "<=" -> "le",
    ">" -> "gt", ">=" -> "ge", "and" -> "and", "or" -> "or")

  private def rootOf(e: Expression): Expression = e match {
    case Alias(child, _) => rootOf(child)
    case other => other
  }

  private def binaryOpOf(root: Expression): Option[String] = root match {
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.children.length == 2 =>
      fnOpNames.get(f.nameParts.last.toLowerCase)
    case e if e.children.length == 2 =>
      binaryOpNames.get(e.getClass.getSimpleName)
    case _ => None
  }

  /** Gate for select/with_columns expressions: bare references pass; a
    * future column inside a binary operator raises the reference's
    * binary-op TypeError (test_udf.py:1145); any other computation raises
    * the generic "Cannot perform" form (:1255 pointer_from shape). */
  def checkExpression(df: DataFrame, c: Column,
      describe: String = "this operation", allowBare: Boolean = true): Unit = {
    // zero-cost on the common path: only tables that actually carry a
    // future column pay the throwaway-analysis gate
    if (!df.schema.fields.exists(isFuture)) return
    val e = analyzedExpr(df, c)
    val refs = futureRefs(e)
    if (refs.isEmpty) return
    val root = rootOf(e)
    if (root.isInstanceOf[AttributeReference]) {
      // bare pass-through is the ONE allowed projection use; as a filter
      // condition / join predicate it is still a USE and raises
      if (allowBare) return
      throw new IllegalArgumentException(
        s"Using column of type ${render(refs.head._2)} is not allowed " +
        "here. Consider applying `await_futures()` to the table first.")
    }
    binaryOpOf(root) match {
      case Some(op) =>
        val types = root.children.map { ch =>
          ch.collectFirst {
            case a: AttributeReference if a.metadata.contains(Flag) =>
              render(a.metadata.getString(Flag))
          }.getOrElse(
            scala.util.Try(pyName(ch.dataType)).getOrElse("<class 'int'>"))
        }
        throw new IllegalArgumentException(
          s"Pathway does not support using binary operator $op on columns " +
          s"of types ${types.mkString(", ")}.")
      case _ =>
        throw new IllegalArgumentException(
          s"Cannot perform $describe when column of type " +
          s"${render(refs.head._2)} is involved. Consider applying " +
          "`await_futures()` to the table used here.")
    }
  }

  /** Future refs seen through ANALYSIS: a function application (e.g.
    * `upper(t("ret"))`) converts lazily to an opaque ColumnNodeExpression
    * leaf, so the unanalyzed walk misses the wrapped reference — the gate
    * must analyze a throwaway projection, exactly like checkExpression /
    * checkReducer (r18 advice). Fast path: a table with no future field
    * pays nothing. */
  private def analyzedFutureRefs(df: DataFrame, cols: Seq[Column]): Seq[(String, String)] = {
    // the unanalyzed walk first: it is free (no analysis job) and it is
    // the only detector for a future column RESOLVED AGAINST ANOTHER
    // TABLE (t1.groupby(key = t2("fut")) — the gated df's schema then has
    // no future field, so the schema short-circuit alone would wave the
    // misuse through to a raw resolution error with no await_futures
    // guidance)
    val direct = cols.flatMap(futureRefs)
    if (direct.nonEmpty) direct
    else {
      // a FOREIGN table's future column hidden inside a computation
      // (upper(t2("fut")) as a key on a future-free table) resolves against
      // NEITHER walk above — the gated df has no future field and the
      // opaque leaf hides the ref — but the lazy node tree still carries
      // the resolved foreign AttributeReference; walk it without analysis
      // (r19 advice). Plan-free, so it runs unconditionally.
      val embedded = cols.flatMap(c =>
        org.apache.spark.sql.GraftExprBridge.embeddedExpressions(c)
          .flatMap(futureRefs)).distinct
      if (embedded.nonEmpty) embedded
      else if (!df.schema.fields.exists(isFuture)) Nil
      else cols.flatMap(c => futureRefs(analyzedExpr(df, c)))
    }
  }

  /** Gate for groupby keys, sort keys/instances, deduplicate columns —
    * the uniform "not allowed here" message (test_udf.py:1182-1254).
    * Analysis-aware: a future column hidden inside a computation (e.g. a
    * function application used as a key) is still a USE and raises. */
  def checkUsable(df: DataFrame, cols: Seq[Column]): Unit =
    analyzedFutureRefs(df, cols).headOption.foreach { case (_, inner) =>
      throw new IllegalArgumentException(
        s"Using column of type ${render(inner)} is not allowed here. " +
        "Consider applying `await_futures()` to the table first.")
    }

  /** Gate for join predicates: the condition Column is an opaque lazy node
    * spanning two frames, so the check walks the ANALYZED Join condition of
    * the already-built join instead (metadata survives analysis). */
  def checkJoinCondition(joined: DataFrame): Unit = {
    if (!joined.schema.fields.exists(isFuture)) return
    org.apache.spark.sql.GraftExprBridge.analyzedPlan(joined)
      .collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition }
      .flatten.flatMap(futureRefs).headOption.foreach { case (_, inner) =>
        throw new IllegalArgumentException(
          s"Using column of type ${render(inner)} is not allowed here. " +
          "Consider applying `await_futures()` to the table first.")
      }
  }

  /** Gate for whole-operator computations over explicit column lists
    * (e.g. pointer_from — test_udf.py:1255): any future reference is
    * rejected, bare or not. Analysis-aware like [[checkUsable]]. */
  def checkComputed(df: DataFrame, cols: Seq[Column], describe: String): Unit =
    analyzedFutureRefs(df, cols).headOption.foreach { case (_, inner) =>
      throw new IllegalArgumentException(
        s"Cannot perform $describe when column of type ${render(inner)} " +
        "is involved. Consider applying `await_futures()` to the table " +
        "used here.")
    }

  private val reducerNames: Map[String, String] = Map(
    "Sum" -> "sum", "Min" -> "min", "Max" -> "max", "Average" -> "avg",
    "Count" -> "count", "CollectList" -> "tuple", "CollectSet" -> "tuple",
    "First" -> "earliest", "Last" -> "latest")

  private val fnToReducer: Map[String, String] = Map(
    "sum" -> "sum", "min" -> "min", "max" -> "max", "avg" -> "avg",
    "count" -> "count", "collect_list" -> "tuple", "collect_set" -> "tuple",
    "first" -> "earliest", "last" -> "latest")

  /** Gate for reducer arguments (test_udf.py:1169): names the reducer.
    * Spark 4 builds `functions.sum(...)` as UnresolvedFunction, so the name
    * is read from either the function name or the resolved aggregate
    * class; a future ref with NO recognizable reducer node (e.g. a bare
    * column) falls back to the uniform "not allowed here" form rather than
    * inventing a reducer name. */
  def checkReducer(df: DataFrame, c: Column): Unit = {
    if (!df.schema.fields.exists(isFuture)) return
    val e = analyzedExpr(df, c)
    val refs = futureRefs(e)
    if (refs.isEmpty) return
    val agg = e.collectFirst {
      case e: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if fnToReducer.contains(e.nameParts.last.toLowerCase) =>
        fnToReducer(e.nameParts.last.toLowerCase)
      case e if reducerNames.contains(e.getClass.getSimpleName) =>
        reducerNames(e.getClass.getSimpleName)
    }
    agg match {
      case Some(name) => throw new IllegalArgumentException(
        s"Cannot perform pathway.reducers.$name when column of type " +
        s"${render(refs.head._2)} is involved. Consider applying " +
        "`await_futures()` to the table used here")
      case None => throw new IllegalArgumentException(
        s"Using column of type ${render(refs.head._2)} is not allowed " +
        "here. Consider applying `await_futures()` to the table first.")
    }
  }
}
