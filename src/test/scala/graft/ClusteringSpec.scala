package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clustering

/** Clustering.viaLsh (reference stdlib/ml/classifiers/_clustering_via_lsh.py):
  * LSH buckets → representative k-means → per-point majority vote. */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("viaLsh groups well-separated directional clusters homogeneously") {
    // 3 tight cones around near-orthogonal directions in R^8; jitter is a
    // small deterministic per-point offset, so every run sees the same data
    val dirs = Seq(
      Array(10f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 10f, 0f, 0f, 0f, 1f, 0f, 0f),
      Array(0f, 0f, 10f, 0f, 0f, 0f, 1f, 0f))
    val pts = for (c <- 0 until 3; i <- 0 until 30) yield {
      val v = dirs(c).clone()
      v(7) = (i % 5 - 2) * 0.1f // jitter off-axis, angle << inter-cluster angle
      (c * 100L + i, v, c)
    }
    val df = pts.toDF("id", "vec", "truth")
    // 6 planes/table: two distinct cones collide in a table's bucket with
    // prob (1/2)^6 ≈ 1.6%, so buckets are (near-)pure and votes are clean
    val labeled = Clustering.viaLsh(df, col("id"), col("vec"),
      dim = 8, k = 3, nPlanes = 6, nTables = 5, lloydIters = 2)
    val joined = labeled.join(df, labeled("id") === df("id")).select("truth", "label")
    // homogeneity: every true cluster maps to exactly one output label
    val perTruth = joined.groupBy("truth").agg(countDistinct("label").as("n"))
      .collect().map(_.getLong(1))
    assert(perTruth.forall(_ == 1L), s"true clusters split: ${perTruth.mkString(",")}")
    // and the clustering is non-trivial: the 3 cones get 3 distinct labels
    assert(joined.select("label").distinct().count() == 3)
  }

  test("viaLsh on the embeddings fixture: total, unique, deterministic") {
    val e = spark.read.parquet(s"${SparkTestBase.sfDir}/embeddings.parquet")
    def run() = Clustering.viaLsh(e, col("vec_id"), col("embedding"),
      dim = 64, k = 3, nPlanes = 4, nTables = 4, lloydIters = 2)
    val a = run().collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.length == e.count(), "every point labeled exactly once")
    assert(a.map(_._2).distinct.forall(l => l >= 0 && l < 3))
    assert(a.map(_._2).distinct.length > 1, "clustering must be non-trivial")
    val b = run().collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b), "bit-deterministic across runs")
  }
}
