package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Embedders, Similarity}

class EmbeddersSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("embed adds an integer-count array<float> column, deterministic per text") {
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "other text"))
      .toDF("id", "text")
    val out = Embedders.embed(df, "text", dim = 16).cache()
    assert(out.columns.toSeq == Seq("id", "text", "embedding"))
    val vecs = out.select("id", "embedding").as[(Long, Seq[Float])].collect().toMap
    assert(vecs(1L) == vecs(2L))          // deterministic
    assert(vecs(1L) != vecs(3L))
    // signed token counts: exact small integers (oracle-reproducible; cosine
    // downstream is scale-invariant so normalization is deliberately absent)
    assert(vecs(1L).forall(x => x == math.rint(x)))
    assert(math.abs(vecs(1L).map(_.toDouble).map(math.abs).sum - 2.0) < 1e-9)
  }

  test("ivfKnn finds the exact duplicate within probed cells") {
    val vecs = (0L until 40L).map { i =>
      (i, Seq.tabulate(8)(d => ((i * 7 + d * 3) % 11).toFloat / 11f))
    }
    val df = (vecs :+ (100L, vecs(5)._2)).toDF("id", "v") // 100 duplicates vec 5
    val knn = Similarity.ivfKnn(df.filter(col("id") === 100L), col("id"), col("v"),
      df, col("id"), col("v"), k = 3, nCells = 8, nProbe = 3)
    val top = knn.orderBy("rank").select("nn_id").as[Long].collect()
    assert(top.head == 5L) // its own duplicate ranks first
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

  test("knnClassify: majority vote, deterministic tie-break, null for candidate-less query") {
    // hand-built knn result: q1 sees labels (a,a,b) → a; q2 sees (a,b) tied
    // → tie-break label ASC → a; q3 retrieved nothing → null
    val knn = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 12L))
      .toDF("query_id", "nn_id")
    val labels = Seq((10L, "a"), (11L, "a"), (12L, "b")).toDF("id", "label")
    val queries = Seq(1L, 2L, 3L).toDF("qid")
    val out = Similarity.knnClassify(queries, col("qid"), knn,
      labels, col("id"), col("label"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("a"))
    assert(out(2L).contains("a")) // 1-1 vote tie → smallest label
    assert(out(3L).isEmpty)       // reference knns_empty path: null label
  }
}
