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
  test("euclidean LSH bucketer: L band keys per point (test_bucketer_euclidean)") {
    import graft.operators.Clustering
    val b = Clustering.euclideanLshBands(d = 3, M = 5, L = 7, A = 3)
    assert(b(Seq(1.0, 2.0, 3.0)).length == 7)
    assert(b(Seq(4.0, 5.0, 6.0)).length == 7)
    val c = Clustering.cosineLshBands(d = 3, M = 5, L = 7)
    assert(c(Seq(1.0, 2.0, 3.0)).length == 7)
  }

  test("lsh flatten: close points share a band, distant ones never do (test_lsh, test_lsh_bucketing)") {
    import graft.operators.Clustering
    val data = Seq((0L, Seq(1.0, 2.0, 3.0)), (1L, Seq(1.02, 2.01, 3.03)),
      (2L, Seq(4.0, 5.0, 6.0))).toDF("id", "v")
    val bucketer = Clustering.euclideanLshBands(d = 3, M = 5, L = 3, A = 3)
    val flat = Clustering.lshFlatten(data, col("id"), col("v"), bucketer)
    // bucketing is properly indexed 0..L-1
    assert(flat.select("bucketing").distinct().collect().map(_.getInt(0)).sorted
      .sameElements(Array(0, 1, 2)))
    // close points (0, 1) co-bucket in at least one band; the distant point
    // (2) NEVER co-buckets with either (the reference's seed happens to put
    // 0 and 1 together in all bands — the structural contract is
    // together-somewhere / apart-everywhere)
    val groups = flat.groupBy("bucketing", "band")
      .agg(sort_array(collect_list(col("data_id"))).as("ids"))
      .select("ids").collect().map(_.getSeq[Long](0).toList).toSet
    assert(groups.contains(List(0L, 1L)), s"0 and 1 never co-bucket: $groups")
    assert(groups.forall(g => !g.contains(2L) || g == List(2L)),
      s"2 co-bucketed with a distant point: $groups")
  }

}
