package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** One-off scale probe (VERDICT r6 item 10): replicate the embeddings table
  * `mult`× with offset ids, then time the LSH family warm — kernelized
  * expressions vs the interpreted-HOF forms they replaced — to confirm the
  * per-row eval win and linear scaling before the 100× claim. Results are
  * recorded in BASELINE.md; not part of the driver contract.
  *
  * Usage: runMain graft.ScaleProbe [mult]   (env SPARK_GRAFT_SF_DIR)
  */
object ScaleProbe {
  /** The pre-kernelization cosine: interpreted aggregate/zip_with folds. */
  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    val nb = aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    dot / (sqrt(na) * sqrt(nb))
  }

  private def hofSrpBucket(vec: org.apache.spark.sql.Column, table: Int, nPlanes: Int, dim: Int) = {
    val planes = typedLit(Similarity.srpPlanes(table, nPlanes, dim))
    array_join(
      transform(sequence(lit(0), lit(nPlanes - 1)), p => {
        val proj = aggregate(
          zip_with(vec, element_at(planes, p + 1), (x, s) => x.cast("double") * s),
          lit(0.0), (a, v) => a + v)
        when(proj > 0, lit("1")).otherwise(lit("0"))
      }), "")
  }

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // CrossHash.mix relies on non-ANSI Long wrap-around (project-wide
      // session setting, see CrossHash scaladoc)
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = base.count()
    val scaled = (0 until mult).map(i =>
        base.select((col("vec_id") + lit(i * n)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    scaled.write.mode("overwrite").parquet("/tmp/graft_emb_scaled")
    val emb = spark.read.parquet("/tmp/graft_emb_scaled")
    val q = emb.filter(col("vec_id") < 10)

    def time(name: String)(df: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm = once()
      println(f"PROBE $name%-28s rows=${n * mult}%-8d cold=$cold%7.2fs warm=$warm%7.2fs")
    }

    time("cosine_kernel") {
      emb.select(Similarity.cosine(col("embedding"), reverse(col("embedding"))).as("s"))
        .agg(sum("s"))
    }
    time("cosine_hof") {
      emb.select(hofCosine(col("embedding"), reverse(col("embedding"))).as("s"))
        .agg(sum("s"))
    }
    time("srp_kernel") {
      emb.select(posexplode(Similarity.srpAllBuckets(col("embedding"), 12, 6, 64)))
        .groupBy("col").count()
    }
    time("srp_hof") {
      val buckets = (0 until 12).map(t => hofSrpBucket(col("embedding"), t, 6, 64))
      emb.select(posexplode(array(buckets: _*))).groupBy("col").count()
    }
    time("knn_lsh_full") {
      Similarity.lshKnn(q, col("vec_id"), col("embedding"),
        emb, col("vec_id"), col("embedding"), k = 5, dim = 64)
    }
    time("knn_brute_full") {
      Similarity.bruteForceKnn(q, col("vec_id"), col("embedding"),
        emb, col("vec_id"), col("embedding"), k = 5)
    }

    // text-dedup family at the same multiplier (documents replicated with
    // offset ids, so true-dup structure scales with the corpus)
    val docsBase = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val nd = docsBase.count()
    val docsScaled = (0 until mult).map(i =>
        docsBase.select((col("doc_id") + lit(i * nd)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    docsScaled.write.mode("overwrite").parquet("/tmp/graft_docs_scaled")
    val docs = spark.read.parquet("/tmp/graft_docs_scaled")
    time("dedup_minhash_lsh") {
      graft.operators.Dedup.minhashLsh(docs, col("doc_id"), col("text"), threshold = 0.7)
    }
    time("dedup_spans") {
      graft.operators.TrainPrep.duplicateSpans(docs, col("doc_id"), col("text"), k = 10)
    }
    spark.stop()
    sys.exit(0)
  }
}
