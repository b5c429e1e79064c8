package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Linalg

class LinalgSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Deterministic sparse integer matrix: cell (i,k) present iff the mix
    * clears `keep` of 10; integer values so every sum order is exact. */
  private def sparseMat(rows: Int, cols: Int, keep: Int, salt: Int): DataFrame =
    (for {
      i <- 0 until rows; k <- 0 until cols
      mix = (i * 31 + k * 17 + salt * 7) % 10 if mix < keep
    } yield (i.toLong, k.toLong, ((i * 13 + k * 5 + salt) % 9 - 4).toDouble))
      .toDF("i", "k", "v")

  private def asMap(df: DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("blockMatmul equals cooMatmul on sparse matrices, bs not dividing dims") {
    for (bs <- Seq(3, 8, 64)) {
      val a = sparseMat(23, 17, 6, salt = 1)
      val b = sparseMat(17, 29, 6, salt = 2).toDF("k", "j", "v")
      val blocked = asMap(Linalg.blockMatmul(a, b, bs))
      val coo = asMap(Linalg.cooMatmul(a, b))
      assert(blocked == coo, s"bs=$bs")
    }
  }

  test("COO presence semantics: present-but-zero entries still emit their cells") {
    val a = Seq((0L, 0L, 0.0), (1L, 5L, 2.0)).toDF("i", "k", "v")
    val b = Seq((0L, 3L, 7.0), (5L, 3L, 1.0)).toDF("k", "j", "v")
    val out = asMap(Linalg.blockMatmul(a, b, 4))
    // (0,3) exists because a(0,0) is PRESENT (the join emits the pair) even
    // though its value is 0; a row absent from the join emits nothing.
    assert(out == Map((0L, 3L) -> 0.0, (1L, 3L) -> 2.0))
    assert(out == asMap(Linalg.cooMatmul(a, b)))
  }

  test("duplicate coordinates pre-sum, matching join-multiplicity semantics") {
    val a = Seq((0L, 0L, 2.0), (0L, 0L, 3.0)).toDF("i", "k", "v")
    val b = Seq((0L, 1L, 10.0)).toDF("k", "j", "v")
    assert(asMap(Linalg.blockMatmul(a, b, 2)) == Map((0L, 1L) -> 50.0))
    assert(asMap(Linalg.cooMatmul(a, b)) == Map((0L, 1L) -> 50.0))
  }

  test("identity: A × I = A on the present cells") {
    val a = sparseMat(12, 12, 7, salt = 3)
    val id = (0 until 12).map(k => (k.toLong, k.toLong, 1.0)).toDF("k", "j", "v")
    val out = asMap(Linalg.blockMatmul(a, id, 5))
    val expect = a.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out == expect)
  }

  test("partition invariance: result independent of input partitioning") {
    val a = sparseMat(20, 20, 5, salt = 4)
    val b = sparseMat(20, 20, 5, salt = 5).toDF("k", "j", "v")
    val base = asMap(Linalg.blockMatmul(a, b, 7))
    for (p <- Seq(1, 13)) {
      val got = asMap(Linalg.blockMatmul(a.repartition(p), b.repartition(p), 7))
      assert(got == base, s"partitions=$p")
    }
  }

  /** The exact HOF chain the native [[graft.functions.MatMul2d]] replaced
    * (r20) — kept here as the semantics pin: identical left-to-right 0.0-seed
    * double folds AND identical null poisoning, bit-for-bit. */
  private def hofMatmul2d(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(a, row =>
      transform(sequence(lit(1), size(element_at(b, 1))), j =>
        aggregate(zip_with(row, b, (x, brow) => x.cast("double") * element_at(brow, j)),
          lit(0.0), (acc, v) => acc + v)))

  test("MatMul2d native kernel ≡ the HOF chain it replaced, bit-for-bit " +
      "(values, fold order, null poisoning)") {
    import graft.functions.Exprs
    // non-round doubles so any fold-order difference shows in the bits
    val flat = (0 until 64).map(i => math.sin(i + 1) * 3.7).toArray
    val base = Seq(Tuple1(flat.toSeq)).toDF("v")
      .select(Exprs.reshape(col("v"), 8, 8).as("m"))
    def run(c: org.apache.spark.sql.Column) =
      base.select(c.as("p")).collect()(0)
        .getSeq[scala.collection.Seq[java.lang.Double]](0).toList.map(r => if (r == null) null else r.toList)
    val native = run(Exprs.matmul2d(col("m"), Exprs.transpose2d(col("m"))))
    val hof = run(hofMatmul2d(col("m"), Exprs.transpose2d(col("m"))))
    assert(native == hof) // Seq equality on boxed doubles = exact bit values

    // rectangular product (2×3 · 3×2) and null poisoning: a null element
    // nulls exactly the cells whose k-fold touches it; a null A-row yields a
    // row of null cells
    val aM = Seq(Tuple2(
      Seq(Seq[java.lang.Double](1.5, 2.5, 3.5), null,
          Seq[java.lang.Double](1.0, null, 2.0)),
      Seq(Seq[java.lang.Double](1.25, 2.0), Seq[java.lang.Double](0.5, 1.0),
          Seq[java.lang.Double](2.0, 4.0)))).toDF("a", "b")
    def runOn(df: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column) =
      df.select(c.as("p")).collect()(0)
        .getSeq[scala.collection.Seq[java.lang.Double]](0).toList.map(r => if (r == null) null else r.toList)
    val gotN = runOn(aM, Exprs.matmul2d(col("a"), col("b")))
    val gotH = runOn(aM, hofMatmul2d(col("a"), col("b")))
    assert(gotN == gotH)
    assert(gotN(1) == List(null, null)) // null A-row → poisoned cells
    assert(gotN(2) == List(null, null)) // null element → poisoned folds
  }

  test("MatMul2d degenerate b (empty / null first row): native yields null — " +
      "the documented intended divergence from the HOF chain (advice r20)") {
    import graft.functions.Exprs
    // empty b: HOF (ANSI off, legacy sizeOfNull) sees size(element_at(b,1))
    // = -1 → sequence(1,-1) = [1,0,-1] → rows of 3 null cells; native = null
    val emptyB = Seq(Tuple2(
      Seq(Seq[java.lang.Double](1.0, 2.0)),
      Seq.empty[Seq[java.lang.Double]])).toDF("a", "b")
    val gotEmpty = emptyB.select(Exprs.matmul2d(col("a"), col("b")).as("p")).collect()(0)
    assert(gotEmpty.isNullAt(0), "empty b → null result (graceful, not 3-null-cell rows)")
    // null first b-row: same rule — column count is unknowable
    val nullFirst = Seq(Tuple2(
      Seq(Seq[java.lang.Double](1.0, 2.0)),
      Seq[Seq[java.lang.Double]](null, Seq[java.lang.Double](3.0, 4.0)))).toDF("a", "b")
    val gotNf = nullFirst.select(Exprs.matmul2d(col("a"), col("b")).as("p")).collect()(0)
    assert(gotNf.isNullAt(0), "null first b row → null result")
  }
}
