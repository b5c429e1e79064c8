package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Embedders, Similarity}

class EmbeddersSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("embed adds a unit-norm array<float> column, deterministic per text") {
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "other text"))
      .toDF("id", "text")
    val out = Embedders.embed(df, "text", dim = 16).cache()
    assert(out.columns.toSeq == Seq("id", "text", "embedding"))
    val vecs = out.select("id", "embedding").as[(Long, Seq[Float])].collect().toMap
    assert(vecs(1L) == vecs(2L))          // deterministic
    assert(vecs(1L) != vecs(3L))
    val norm = math.sqrt(vecs(1L).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)   // unit-normalized
  }

  test("embed + bruteForceKnn ranks identical text first") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta"), (4L, "alpha beta delta")).toDF("id", "text")
    val emb = Embedders.embed(df, "text", dim = 16).cache()
    val knn = Similarity.bruteForceKnn(
      emb.filter(col("id") === 1), col("id"), col("embedding"),
      emb, col("id"), col("embedding"), k = 2)
    val top = knn.orderBy("rank").select("nn_id").as[Long].collect()
    assert(top.head == 2L) // the exact duplicate is the nearest neighbor
  }
}
