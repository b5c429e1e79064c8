package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Graphs, Iterate, Utils}
import graft.functions.Udfs

/** Iterate/graph/util semantics on small known graphs. */
class IterateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("fixpoint converges and stops before maxIterations") {
    // halve-until-odd: fixpoint of x -> if even then x/2
    val init = Seq(12L, 5L, 8L).toDF("x")
    val out = Iterate.fixpoint(init,
      df => df.select(when(col("x") % 2 === 0, col("x") / 2).otherwise(col("x"))
        .cast("long").as("x")),
      maxIterations = 20)
    assert(out.as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L))
  }

  test("connectedComponents labels two separate components") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val cc = Graphs.connectedComponents(edges)
    val m = cc.as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(m(_) == 1L) && Seq(10L, 11L).forall(m(_) == 10L))
  }

  test("connectedComponents on an EMPTY edge table returns empty (legal " +
      "input — a corpus with zero duplicate pairs; the counted fingerprint " +
      "must not NPE on the null sum, r19 review)") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graphs.connectedComponents(edges).count() == 0)
  }

  test("bellmanFord finds shortest paths with relaxation") {
    // 0→1 (5), 0→2 (1), 2→1 (2): shortest 0→1 is 3 via 2
    val edges = Seq((0L, 1L, 5L), (0L, 2L, 1L), (2L, 1L, 2L)).toDF("src", "dst", "weight")
    val d = Graphs.bellmanFord(edges, 0L).as[(Long, Long)].collect().toMap
    assert(d == Map(0L -> 0L, 1L -> 3L, 2L -> 1L))
  }

  test("pagerank: symmetric 2-cycle splits mass evenly, fixed point reached") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graphs.pagerank(edges, iters = 5).as[(Long, Long)].collect().toMap
    assert(r(1L) == r(2L) && r(1L) > 400000000000L) // each ≈ 0.5 in 1e-12 units
  }

  test("louvain separates cliques and beats the singleton partition on modularity") {
    val clique1 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val clique2 = for (i <- 11L to 15L; j <- (i + 1) to 15L) yield (i, j)
    val edges = (clique1 ++ clique2 :+ (5L, 11L)).toDF("src", "dst")
    val assign = Graphs.louvain(edges, iters = 6).cache()
    val labels = assign.as[(Long, Long)].collect().toMap
    val c1 = (1L to 5L).map(labels).toSet
    val c2 = (11L to 15L).map(labels).toSet
    assert(c1.size == 1 && c2.size == 1 && c1 != c2)
    val q = Graphs.modularity(edges, assign).as[Double].head()
    val qSingletons = Graphs.modularity(edges,
      edges.select(col("src").as("vertex")).unionByName(edges.select(col("dst").as("vertex")))
        .distinct().withColumn("community", col("vertex"))).as[Double].head()
    assert(q > qSingletons && q > 0.3, s"q=$q singletons=$qSingletons")
  }

  test("louvainMultilevel: coarsening never loses modularity vs one level") {
    // ring-of-cliques: one-level moves find the cliques; level-2 contraction
    // can then merge weakly-bound neighbors when that improves Q
    val cliques = for (c <- 0L until 4L; i <- 0L until 4L; j <- (i + 1) until 4L)
      yield (c * 10 + i, c * 10 + j)
    val bridges = (0L until 4L).map(c => (c * 10, ((c + 1) % 4) * 10 + 1))
    val edges = (cliques ++ bridges).toDF("src", "dst")
    val one = Graphs.louvain(edges, iters = 4).cache()
    val multi = Graphs.louvainMultilevel(edges, iters1 = 4, iters2 = 4).cache()
    assert(multi.count() == one.count()) // every vertex labeled after compose
    val qOne = Graphs.modularity(edges, one).as[Double].head()
    val qMulti = Graphs.modularity(edges, multi).as[Double].head()
    assert(qMulti >= qOne - 1e-12 && qMulti > 0.3, s"qMulti=$qMulti qOne=$qOne")
  }

  test("louvainAuto: 3-level hierarchy converges with a monotone modularity trace") {
    // 16 micro-cliques of 4 (level 1), glued in quads — 3 parallel edges
    // from each leaf clique to its quad's hub clique, a star so synchronous
    // moves can't swap-oscillate — into 4 meso groups (level 2); meso groups
    // chained by single edges (level 3, too weak to merge: rejected by the
    // gain-stop). Expect: 2 accepted levels, strictly increasing trace,
    // quads unified on original ids.
    val microCliques = for {
      c <- 0L until 16L; i <- 0L until 4L; j <- (i + 1) until 4L
    } yield (c * 10 + i, c * 10 + j)
    val mesoGlue = for { g <- 0L until 4L; k <- 1L until 4L; e <- 0L until 3L }
      yield ((g * 4 + k) * 10 + e, (g * 4) * 10 + (e + 1) % 4)
    val macroGlue = (0L until 3L).map(g => (g * 40 + 2, (g + 1) * 40 + 2))
    val edges = (microCliques ++ mesoGlue ++ macroGlue).toDF("src", "dst")
    val (assign, trace) = Graphs.louvainAutoTrace(edges, itersPerLevel = 4, maxLevels = 6)
    val labels = assign.as[(Long, Long)].collect().toMap
    assert(labels.size == 64, "every vertex labeled on original ids")
    // each quad ends up internally agreed (level 2 accepted and folded),
    // and the 4 quads carry distinct labels (level 3 rejected)
    val quadLabels = (0L until 4L).map { g =>
      val ls = (for (c <- g * 4 until (g + 1) * 4; i <- 0L until 4L)
        yield labels(c * 10 + i)).toSet
      assert(ls.size == 1, s"quad $g split across $ls")
      ls.head
    }
    assert(quadLabels.toSet.size == 4, s"quads collapsed: $quadLabels")
    assert(trace.size >= 2, s"expected >= 2 accepted levels, trace=$trace")
    trace.sliding(2).foreach { case Seq(a, b) =>
      assert(b > a, s"accepted trace must strictly increase: $trace") }
    val q = Graphs.modularity(edges, assign).as[Double].head()
    assert(q > 0.5, s"q=$q") // hierarchical cliques: strong community structure
    // and the auto result never loses to the fixed 2-level form
    val q2 = Graphs.modularity(edges,
      Graphs.louvainMultilevel(edges, iters1 = 4, iters2 = 4)).as[Double].head()
    assert(q >= q2 - 1e-12, s"auto q=$q < 2-level q=$q2")
  }

  test("labelPropagation separates two dense cliques joined by one edge") {
    val clique1 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val clique2 = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val edges = (clique1 ++ clique2 :+ (4L, 11L)).toDF("src", "dst")
    val labels = Graphs.labelPropagation(edges, iters = 5).as[(Long, Long)].collect().toMap
    val c1 = (1L to 4L).map(labels).toSet
    val c2 = (11L to 14L).map(labels).toSet
    assert(c1.size == 1 && c2.size == 1 && c1 != c2) // two communities, internally agreed
  }

  test("cosine: zero-norm vectors yield NULL, never NaN (dead embeddings rank last)") {
    import graft.operators.Similarity
    val df = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.0, 0.0)), (3L, Array(0.9, 0.1)))
      .toDF("id", "v")
    val q = Seq((10L, Array(1.0, 0.0))).toDF("id", "v")
    val scores = df.crossJoin(q.select(col("v").as("qv")))
      .select(col("id"), Similarity.cosine(col("v"), col("qv")).as("s"))
      .as[(Long, Option[Double])].collect().toMap
    assert(scores(2L).isEmpty, "zero-norm must be NULL (NaN would sort above every real score)")
    assert(scores(1L).exists(_ > 0.99) && scores(3L).exists(_ > 0.9))
    // end-to-end: the dead embedding must not be crowned top neighbor
    val top = Similarity.bruteForceKnn(q, col("id"), col("v"), df, col("id"), col("v"), k = 1)
      .select("nn_id").as[Long].collect()
    assert(top.sameElements(Array(1L)))
  }

  test("ANN recall: lshKnn and ivfKnn recover most of brute-force top-k") {
    import graft.operators.Similarity
    val e = spark.read.parquet(s"${SparkTestBase.sfDir}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    def topSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val exact5 = topSet(Similarity.bruteForceKnn(q, col("vec_id"), col("embedding"),
      e, col("vec_id"), col("embedding"), k = 5))
    val lsh5 = topSet(Similarity.lshKnn(q, col("vec_id"), col("embedding"),
      e, col("vec_id"), col("embedding"), k = 5, dim = 64))
    // defaults (spill=3) carry the recall contract; spill=2 is the cheaper dial
    val ivfDefault = topSet(Similarity.ivfKnn(q, col("vec_id"), col("embedding"),
      e, col("vec_id"), col("embedding"), k = 5, nCells = 8, nProbe = 4))
    val ivfSpill2 = topSet(Similarity.ivfKnn(q, col("vec_id"), col("embedding"),
      e, col("vec_id"), col("embedding"), k = 5, nCells = 8, nProbe = 4, spill = 2))
    val lshRecall = (lsh5 & exact5).size.toDouble / exact5.size
    val ivfRecall = (ivfDefault & exact5).size.toDouble / exact5.size
    val ivf2Recall = (ivfSpill2 & exact5).size.toDouble / exact5.size
    info(f"recall@5: lsh $lshRecall%.2f ivf(defaults) $ivfRecall%.2f ivf(spill=2) $ivf2Recall%.2f")
    // SRP on near-gaussian embeddings: documented threshold (see srpBucket
    // scaladoc) — far above random (k/N = 5/1000) but not exact
    assert(lshRecall > 0.2, s"lsh recall $lshRecall")
    // near-gaussian data is IVF's worst case (balanced cells, spread
    // neighbors); the spill replication factor is the recall dial —
    // the DEFAULT configuration must hold the documented 0.95 bar
    assert(ivfRecall >= 0.95, s"ivf recall at defaults $ivfRecall")
    assert(ivf2Recall >= 0.9, s"ivf spill=2 recall $ivf2Recall")

    // structural soundness: probing every cell must reproduce brute force
    // exactly (no vector lost or double-assigned by the inverted file)
    val exhaustive = topSet(Similarity.ivfKnn(q, col("vec_id"), col("embedding"),
      e, col("vec_id"), col("embedding"), k = 5, nCells = 8, nProbe = 8))
    assert(exhaustive == exact5)
  }

  test("HNSW recall: per-partition graph index recovers brute-force top-k") {
    import graft.operators.{Hnsw, Similarity}
    val e = spark.read.parquet(s"${SparkTestBase.sfDir}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    def topSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val exact = topSet(Similarity.bruteForceKnn(q, col("vec_id"), col("embedding"),
      e, col("vec_id"), col("embedding"), k = 5))
    val hnsw = topSet(Hnsw.knn(q, col("vec_id"), col("embedding"),
      e.repartition(2), col("vec_id"), col("embedding"), k = 5, dim = 64))
    val recall = (hnsw & exact).size.toDouble / exact.size
    info(f"hnsw recall@5 = $recall%.2f")
    assert(recall >= 0.85, s"hnsw recall $recall")
  }

  test("HNSW determinism: identical rows at 2/8/32 input partitions") {
    import graft.operators.Hnsw
    // construction is a pure function of (corpus, params): levels are id
    // hashes, the corpus re-hashes into a FIXED indexPartitions count, and
    // inserts run in sorted-id order — so input partitioning must not leak
    val e = spark.read.parquet(s"${SparkTestBase.sfDir}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    def rows(nParts: Int) = Hnsw.knn(q, col("vec_id"), col("embedding"),
        e.repartition(nParts), col("vec_id"), col("embedding"), k = 5, dim = 64)
      .select("query_id", "nn_id", "score", "rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    val at2 = rows(2)
    assert(at2.sameElements(rows(8)), "2-part vs 8-part rows differ")
    assert(at2.sameElements(rows(32)), "2-part vs 32-part rows differ")
  }

  test("utils: argmaxRows / majority / unpackCol") {
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("b", 4L, 5.0))
      .toDF("g", "id", "v")
    val top = Utils.argmaxRows(df, Seq(col("g")), col("v"), col("id"))
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(top == Set(("a", 2L), ("b", 4L))) // tie at 30.0 → smaller id

    val maj = Utils.majority(Seq(("g", "x"), ("g", "x"), ("g", "y")).toDF("g", "v"),
      Seq(col("g")), col("v")).select("majority_value").as[String].head
    assert(maj == "x")

    val packed = Seq((1L, ("b1", "t1"))).toDF("id", "s")
    val un = Utils.unpackCol(packed, col("s"), "_1", "_2")
    assert(un.select("_1", "_2").as[(String, String)].head == ("b1", "t1"))
  }

  test("saltedAgg and saltedJoin match their unsalted equivalents") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toLong))
      .toDF("k", "v")
    val agg = Utils.saltedAgg(big, col("k"), 8, sum, sum, col("v"), "total")
    val expectAgg = big.groupBy("k").agg(sum("v").as("total"))
      .as[(String, Long)].collect().toMap
    assert(agg.as[(String, Long)].collect().toMap == expectAgg)

    val small = Seq(("hot", "H"), ("k1", "A")).toDF("sk", "tag")
    val j = Utils.saltedJoin(big, small, col("k"), col("sk"), 4)
      .groupBy("k").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(j == Map("hot" -> 100L, "k1" -> 1L))
  }

  test("udfs: apply1 wraps a typed scalar function; cached memoizes") {
    val double = Udfs.apply1[java.lang.Long, Long](x => x * 2)
    val out = Seq(1L, 2L).toDF("x").select(double(col("x")).as("y")).as[Long].collect()
    assert(out.sorted.toSeq == Seq(2L, 4L))
    var calls = 0
    val f = Udfs.cached[Int, Int] { x => calls += 1; x + 1 }
    assert(f(1) == 2 && f(1) == 2 && calls == 1)
  }

  test("nonEmptyGuard: a pass that EMPTIES a cardinality-preserving table " +
      "fails loudly instead of silently returning nothing (r18 louvain " +
      "empty-frame fence)") {
    import spark.implicits._
    val initial = Seq(1L, 2L, 3L).toDF("v")
    // a legal fixpoint step keeps running under the guard
    val ok = graft.operators.Iterate.nTimesConverged(initial,
      df => df, n = 3, nonEmptyGuard = true)
    assert(ok.count() == 3)
    // a faulty step that drops every row must raise, not converge-to-empty
    val e = intercept[IllegalStateException] {
      graft.operators.Iterate.nTimesConverged(initial,
        df => df.filter(org.apache.spark.sql.functions.lit(false)),
        n = 3, nonEmptyGuard = true)
    }
    assert(e.getMessage.contains("EMPTY"))
    // empty INPUT is legal: guard disarms, empty fixpoint returns
    val empty = graft.operators.Iterate.nTimesConverged(initial.limit(0),
      df => df, n = 2, nonEmptyGuard = true)
    assert(empty.count() == 0)
  }
}
