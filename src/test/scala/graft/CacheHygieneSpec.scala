package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Graphs, Similarity, TrainPrep}

/** No net persisted tables after each operator call (r21, VERDICT #4).
  *
  * Every operator that persists internally must release its entries once its
  * result is materialized: on a long-lived 100 TB session, dead
  * MEMORY_AND_DISK entries accumulate invisibly (the bench's clearCache
  * between queries hid the r20 louvainMultilevel/diversitySample leaks).
  * Asserted via the session CacheManager, which tracks exactly
  * `Dataset.persist` entries — `localCheckpoint` blocks are
  * ContextCleaner-managed (freed when the frame becomes unreachable) and are
  * deliberately out of scope.
  */
class CacheHygieneSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Run `f`, fully materialize its result, and assert the CacheManager
    * carries no entries afterwards. */
  private def assertNoResidue(tag: String)(f: => DataFrame): Unit = {
    spark.sharedState.cacheManager.clearCache()
    val out = f
    out.write.mode("overwrite").format("noop").save()
    assert(spark.sharedState.cacheManager.isEmpty,
      s"$tag left persisted entries behind after its result was consumed")
  }

  private lazy val docs = (0L until 60L).map { i =>
    val fam = i % 7
    (i, s"alpha beta gamma delta epsilon f$fam g$fam h$fam word${i % 3} tail common")
  }.toDF("doc_id", "text")

  private lazy val vecs = (0L until 48L).map { i =>
    (i, Array.tabulate(8)(j => math.sin(i * 0.37 + j) * 2.0))
  }.toDF("id", "v")

  private lazy val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L),
    (10L, 11L), (11L, 12L), (12L, 10L),
    (4L, 10L), (20L, 21L)).toDF("src", "dst")

  test("minhashLsh releases its signature/prefilter/candidate caches") {
    assertNoResidue("minhashLsh") {
      Dedup.minhashLsh(docs, col("doc_id"), col("text"))
    }
  }

  test("dedupGroups path (minhash + CC) releases its caches") {
    assertNoResidue("dedupGroups") {
      Dedup.dedupGroups(docs, col("doc_id"), col("text"))
    }
  }

  test("connectedComponents releases its loop-invariant edge cache") {
    assertNoResidue("connectedComponents") {
      Graphs.connectedComponents(edges)
    }
  }

  test("pagerank releases its loop-invariant caches") {
    assertNoResidue("pagerank") {
      Graphs.pagerank(edges, iters = 3)
    }
  }

  test("bellmanFord releases its loop-invariant edge cache") {
    assertNoResidue("bellmanFord") {
      Graphs.bellmanFord(
        Seq((0L, 1L, 5L), (0L, 2L, 1L), (2L, 1L, 2L)).toDF("src", "dst", "weight"), 0L)
    }
  }

  test("louvain + louvainMultilevel release every persist (r20 leak)") {
    assertNoResidue("louvain") { Graphs.louvain(edges, iters = 3) }
    assertNoResidue("louvainMultilevel") {
      Graphs.louvainMultilevel(edges, iters1 = 2, iters2 = 2)
    }
  }

  test("louvainAuto releases its pinned level caches") {
    assertNoResidue("louvainAuto") { Graphs.louvainAuto(edges, itersPerLevel = 2) }
  }

  test("diversitySample releases the cluster-assignment cache (r20 leak)") {
    assertNoResidue("diversitySample") {
      TrainPrep.diversitySample(vecs, col("id"), col("v"), dim = 8, k = 4, cap = 3)
    }
  }

  test("ivfKnn / ivfCandidates release the quantized-corpus cache") {
    val q = vecs.filter(col("id") < 4)
    assertNoResidue("ivfKnn") {
      Similarity.ivfKnn(q, col("id"), col("v"), vecs, col("id"), col("v"),
        k = 3, nCells = 4, nProbe = 2, refineIters = 1)
    }
    assertNoResidue("ivfCandidates") {
      Similarity.ivfCandidates(q, col("id"), col("v"), vecs, col("id"), col("v"),
        nCells = 4, nProbe = 2, refineIters = 1)
    }
  }

  test("pqKnn / ivfadcKnn release the quantized-corpus cache") {
    val q = vecs.filter(col("id") < 4)
    assertNoResidue("pqKnn") {
      Similarity.pqKnn(q, col("id"), col("v"), vecs, col("id"), col("v"),
        k = 3, dim = 8, m = 2, ksub = 4, refineIters = 1)
    }
    assertNoResidue("ivfadcKnn") {
      Similarity.ivfadcKnn(q, col("id"), col("v"), vecs, col("id"), col("v"),
        k = 3, dim = 8, m = 2, ksub = 4, nCells = 4, nProbe = 2, refineIters = 1)
    }
  }

  test("embeddingDupPairs releases the SRP bucket cache") {
    assertNoResidue("embeddingDupPairs") {
      Similarity.embeddingDupPairs(vecs, col("id"), col("v"), dim = 8,
        threshold = 0.95)
    }
  }
}
