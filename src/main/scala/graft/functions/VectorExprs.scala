package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd vector kernels for the similarity family.
  *
  * The Column-combinator forms (`aggregate`/`zip_with`/`transform`) are
  * CodegenFallback in Spark — every row pays interpreted per-element closure
  * dispatch, a 10-100× tax that multiplies across the corpus scan in
  * `lshKnn`/`bruteForceKnn`/`ivfKnn`/`embeddingDupPairs`/DocumentStore
  * retrieval. These expressions compute the identical arithmetic (same
  * left-to-right IEEE double accumulation order, so the DuckDB oracles'
  * `list_reduce` folds stay bit-exact) as a tight JVM loop inside
  * whole-stage codegen.
  */
private[graft] object VectorExprs {
  /** Per-element read returning double, by array element type. */
  def getD(a: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case other       => throw new IllegalStateException(s"unsupported element type $other")
  }

  /** Java source for the same per-element read (codegen twin of [[getD]]). */
  def getCode(arr: String, idx: String, et: DataType): String = et match {
    case FloatType   => s"(double) $arr.getFloat($idx)"
    case DoubleType  => s"$arr.getDouble($idx)"
    case IntegerType => s"(double) $arr.getInt($idx)"
    case LongType    => s"(double) $arr.getLong($idx)"
    case ShortType   => s"(double) $arr.getShort($idx)"
    case other       => throw new IllegalStateException(s"unsupported element type $other")
  }

  def numericArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType | ShortType, _) => true
    case _ => false
  }
}

/** Cosine similarity of two numeric-array columns.
  *
  * Exact semantics of the previous HOF form
  * (`aggregate(zip_with(a,b,x*y),0.0,+) / (sqrt(Σx²)·sqrt(Σy²))`): each
  * accumulator sums left-to-right in index order in double, so results are
  * bit-identical; null out on length mismatch or any null element (a null
  * product poisons the fold in the HOF form).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.numericArray(left.dataType) && VectorExprs.numericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric array inputs, got ${left.dataType} / ${right.dataType}")

  @transient private lazy val etL = left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val etR = right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = VectorExprs.getD(a, i, etL)
      val y = VectorExprs.getD(b, i, etR)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // Zero-norm vectors divide by zero: the HOF form's Divide returned NULL
    // (non-ANSI), never NaN — NaN would sort above every real score in a
    // descending ORDER BY and crown a dead embedding the top neighbor.
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    double $x = ${VectorExprs.getCode(a, i.toString, etL)};
         |    double $y = ${VectorExprs.getCode(b, i.toString, etR)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($bad || $na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two numeric-array columns — the reference's 1-D MatMul
  * (`@`, expression.rs:134). Same fold semantics as [[CosineSim]]'s
  * numerator: left-to-right double accumulation, null on length mismatch or
  * any null element. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.numericArray(left.dataType) && VectorExprs.numericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric array inputs, got ${left.dataType} / ${right.dataType}")

  @transient private lazy val etL = left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val etR = right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += VectorExprs.getD(a, i, etL) * VectorExprs.getD(b, i, etR)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $dot += ${VectorExprs.getCode(a, i.toString, etL)} *
         |      ${VectorExprs.getCode(b, i.toString, etR)};
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared euclidean distance — the reference index family's default metric
  * (tests/ml/test_index.py pins get_distances to SQUARED L2: (0,0)→(-1,0) is
  * 1, (−2,−3)→(1,−4) is 10; USearchMetricKind.L2SQ). Same codegen shape as
  * [[DotProduct]]. */
case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_sq"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.numericArray(left.dataType) && VectorExprs.numericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric array inputs, got ${left.dataType} / ${right.dataType}")

  @transient private lazy val etL = left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val etR = right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = VectorExprs.getD(a, i, etL) - VectorExprs.getD(b, i, etR)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val bad = ctx.freshName("bad")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    double $d = ${VectorExprs.getCode(a, i.toString, etL)} -
         |      ${VectorExprs.getCode(b, i.toString, etR)};
         |    $acc += $d * $d;
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Floor-quantize a numeric array to exact Longs: element → floor(x·scale)
  * (the `transform(vec, x => floor(x*Q).cast("long"))` HOF without the
  * interpreted per-element dispatch; null elements stay null). */
case class QuantizeVec(child: Expression, scale: Long) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(LongType, child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "quantize_vec"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.numericArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric array input, got ${child.dataType}")

  @transient private lazy val et = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (v.isNullAt(i)) null
        else math.floor(VectorExprs.getD(v, i, et) * scale).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i)) {
         |    $out[$i] = (Long) (long) java.lang.Math.floor(
         |      ${VectorExprs.getCode(v, i.toString, et)} * ${scale}L);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 2-D matrix product of two `array<array<numeric>>` columns — the native
  * twin of the `transform(a, row => transform(seq, j => aggregate(zip_with(
  * row, b, x·b[k][j]), 0.0, +)))` HOF chain it replaces (r20).
  *
  * The HOF form was not merely interpreted: `b` is an EXPRESSION (in the
  * board row, `transpose2d(m)` with the reshape inlined), and the inner
  * `zip_with(row, b, …)` re-evaluates it once per OUTPUT CELL — 64
  * re-transposes per row on an 8×8 product (measured 2.6 s warm at 500 rows).
  * As a BinaryExpression both children evaluate exactly once per row and the
  * k-fold runs as a JVM loop.
  *
  * Value semantics are the HOF's, bit-for-bit on the oracle-checked shape:
  * cell(i,j) = 0.0 + a[i][0]·b[0][j] + a[i][1]·b[1][j] + … accumulated
  * left-to-right in double; a null row in `a` yields a row of null cells
  * (zip_with(null, b) poisons every fold); a null element, a row-length
  * mismatch against `b`, or a `b` row shorter than j yields a null cell
  * (null products poison the fold). The column count comes from `b`'s first
  * row like `size(element_at(b, 1))`; an empty or null-first-row `b` yields
  * null — a DOCUMENTED divergence from the HOF chain on that degenerate
  * input (with ANSI off + legacy sizeOfNull the HOF's
  * `sequence(1, size(element_at(b,1)))` = sequence(1,-1) = [1,0,-1], so it
  * returns rows of 3 null cells; the native kernel's null is the graceful
  * intended behavior — LinalgSpec pins both degenerate cases). */
case class MatMul2d(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = true), containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "matmul_2d"

  private def matrixType(dt: DataType): Boolean = dt match {
    case ArrayType(inner, _) => VectorExprs.numericArray(inner)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (matrixType(left.dataType) && matrixType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<array<numeric>> inputs, got ${left.dataType} / ${right.dataType}")

  @transient private lazy val etL = left.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[ArrayType].elementType
  @transient private lazy val etR = right.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  /** The kernel, shared by interpreted eval and codegen (r21: was
    * CodegenFallback, which re-evaluated the CHILD subtree interpreted per
    * row; now children run inside whole-stage codegen and only this call is
    * a single virtual dispatch per row). */
  private[functions] def compute(a: ArrayData, b: ArrayData): Any = {
    val nb = b.numElements()
    if (nb == 0 || b.isNullAt(0)) return null
    // b rows decoded once per (a,b) evaluation — not once per cell
    val bRows = new Array[ArrayData](nb)
    var k = 0
    while (k < nb) {
      bRows(k) = if (b.isNullAt(k)) null else b.getArray(k)
      k += 1
    }
    val nCols = bRows(0).numElements()
    val nRows = a.numElements()
    val out = new Array[Any](nRows)
    var i = 0
    while (i < nRows) {
      val cells = new Array[Any](nCols)
      if (!a.isNullAt(i)) {
        val row = a.getArray(i)
        val nk = math.max(row.numElements(), nb) // zip_with pads the shorter side
        var j = 0
        while (j < nCols) {
          var acc = 0.0
          var ok = true
          var kk = 0
          while (ok && kk < nk) {
            if (kk >= row.numElements() || row.isNullAt(kk)) ok = false // null x
            else if (kk >= nb || bRows(kk) == null) ok = false          // null b row
            else {
              val br = bRows(kk)
              if (j >= br.numElements() || br.isNullAt(j)) ok = false   // element_at → null
              else acc += VectorExprs.getD(row, kk, etL) * VectorExprs.getD(br, j, etR)
            }
            kk += 1
          }
          cells(j) = if (ok) acc else null
          j += 1
        }
      } // null row: every cell stays null (the HOF's poisoned folds)
      out(i) = new GenericArrayData(cells)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("matmul2d", this, classOf[MatMul2d].getName)
      val res = ctx.freshName("res")
      s"""
         |Object $res = $self.compute($a, $b);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $res; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `nTables` SRP bucket bitstrings of a vector in one corpus pass.
  *
  * Twin of the per-table `Similarity.srpBucket` Column form (same Rademacher
  * planes, same left-to-right projection fold, `proj > 0` → '1'): on length
  * mismatch or a null element the HOF fold yields a null projection which
  * `when(proj > 0,...).otherwise("0")` turns into '0' — reproduced here.
  * Output is array(nTables) of nPlanes-char strings, fed to `posexplode` so
  * (pos, col) = (_table, _bucket) exactly as the previous
  * `posexplode(array(bucket_0..bucket_T))` produced.
  */
case class SrpAllBuckets(child: Expression, planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "srp_all_buckets"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.numericArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric array input, got ${child.dataType}")

  private val nTables = planes.length
  private val nPlanes = planes.head.length
  private val dim = planes.head.head.length
  @transient private lazy val p: Array[Array[Array[Double]]] =
    planes.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val et = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bad = n != dim
    if (!bad) {
      var i = 0
      while (i < n && !bad) { if (v.isNullAt(i)) bad = true; i += 1 }
    }
    val out = new Array[AnyRef](nTables)
    var t = 0
    while (t < nTables) {
      val cs = new Array[Char](nPlanes)
      var pi = 0
      while (pi < nPlanes) {
        if (bad) cs(pi) = '0'
        else {
          val pl = p(t)(pi)
          var acc = 0.0; var i = 0
          while (i < dim) { acc += VectorExprs.getD(v, i, et) * pl(i); i += 1 }
          cs(pi) = if (acc > 0) '1' else '0'
        }
        pi += 1
      }
      out(t) = UTF8String.fromString(new String(cs))
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pRef = ctx.addReferenceObj("srpPlanes", p, "double[][][]")
      val n = ctx.freshName("n"); val bad = ctx.freshName("bad")
      val i = ctx.freshName("i"); val t = ctx.freshName("t"); val pp = ctx.freshName("pp")
      val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      val pl = ctx.freshName("pl"); val cs = ctx.freshName("cs"); val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |boolean $bad = ($n != $dim);
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($v.isNullAt($i)) { $bad = true; break; }
         |  }
         |}
         |org.apache.spark.unsafe.types.UTF8String[] $out =
         |  new org.apache.spark.unsafe.types.UTF8String[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  char[] $cs = new char[$nPlanes];
         |  for (int $pp = 0; $pp < $nPlanes; $pp++) {
         |    if ($bad) { $cs[$pp] = '0'; }
         |    else {
         |      double $acc = 0.0;
         |      double[] $pl = $pRef[$t][$pp];
         |      for (int $j = 0; $j < $dim; $j++) {
         |        $acc += ${VectorExprs.getCode(v, j.toString, et)} * $pl[$j];
         |      }
         |      $cs[$pp] = $acc > 0 ? '1' : '0';
         |    }
         |  }
         |  $out[$t] = org.apache.spark.unsafe.types.UTF8String.fromString(new String($cs));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
