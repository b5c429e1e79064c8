package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graphs

/** Replays of the reference's graph fixtures (tests/test_graphs.py, r16
  * decode): the EXACT integer pagerank (stdlib/graphs/pagerank/impl.py —
  * init 6000, `rank*5 // (degree*6)` floor damping, +1000 inflow floor,
  * out-only vertices pinned at 1000) and the bellman_ford vector including
  * a negative edge and the unreachable-vertex contract. */
class GraphFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String)], steps: Int): Map[String, Long] =
    Graphs.pagerankRef(edges.toDF("src", "dst"), steps)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("test_page_rank1: 3-cycle-with-chord ranks replay bit-exactly at 20 steps") {
    val out = ranksOf(Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "b"), 20)
    assert(out == Map("a" -> 3896L, "b" -> 7142L, "c" -> 6951L))
  }

  test("test_page_rank2: the dangling-in vertex d stays pinned at 1000") {
    val out = ranksOf(Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "b", "d" -> "a"), 20)
    assert(out == Map("a" -> 5393L, "b" -> 9053L, "c" -> 8543L, "d" -> 1000L))
  }

  test("test_page_rank_zero_outdegree_nodes: sink vertex converges to 1833") {
    val out = ranksOf(Seq("a" -> "b"), 10)
    assert(out == Map("a" -> 1000L, "b" -> 1833L))
  }

  test("test_page_rank_one_node_edge_case: empty edges → empty ranks") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graphs.pagerankRef(empty, 50).count() == 0L)
  }

  test("test_bellman_ford: negative edge relaxes; unreachable vertex maps to infinity") {
    val edges = Seq((1L, 2L, 100L), (1L, 3L, 200L), (1L, 4L, 300L),
      (3L, 5L, 100L), (3L, 6L, 500L), (5L, 6L, 100L), (6L, 3L, -50L))
      .toDF("src", "dst", "weight")
    val dist = Graphs.bellmanFord(edges, sourceId = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == Map(1L -> 0L, 2L -> 100L, 3L -> 200L, 4L -> 300L,
      5L -> 300L, 6L -> 400L))
    // the reference reports unreachable vertices as math.inf; our contract is
    // "omitted" — the inf view is a left join away
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("vertex")
    val withInf = vertices.join(Graphs.bellmanFord(edges, 1L), Seq("vertex"), "left")
      .select(col("vertex"),
        coalesce(col("dist").cast("double"), lit(Double.PositiveInfinity)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(withInf(7L).isPosInfinity)
    assert(withInf(6L) == 400.0)
  }

  // ── r17 decode: contraction machinery + exact modularity
  //    (tests/test_graphs.py:185-563; stdlib/graphs/graph.py:40-160,
  //     louvain_communities/impl.py:340) ────────────────────────────────────

  private val fiveV = Seq(1L, 2L, 3L, 4L, 5L).toDF("vid")
  private val sevenE = Seq((1L, 2L), (1L, 3L), (1L, 2L), (2L, 2L), (2L, 3L),
    (5L, 5L), (5L, 5L)).toDF("u", "v")
  private val partialCm = Seq((1L, 1L), (2L, 1L), (4L, 4L)).toDF("vid", "c")

  test("test_remove_self_loops_01: u==v edges drop, duplicates stay") {
    val got = Graphs.withoutSelfLoops(sevenE).as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("test_extended_to_full_clustering_01: unassigned vertices become " +
      "singleton clusters keyed by their own id") {
    val got = Graphs.extendToFullClustering(fiveV, partialCm)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("test_contracted_to_multi_graph_01: endpoints map to clusters, " +
      "parallel edges kept, vertex set = clusters") {
    val (nv, ne) = Graphs.contractToMultiGraph(fiveV, sevenE, partialCm)
    assert(nv.as[Long].collect().toSet == Set(1L, 3L, 4L, 5L))
    val got = ne.as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 1L), (1L, 1L), (1L, 1L), (1L, 3L), (1L, 3L),
      (5L, 5L), (5L, 5L)))
  }

  test("test_contracted_to_simple_graph_01: parallel edges collapse") {
    val (nv, ne) = Graphs.contractToSimpleGraph(fiveV, sevenE, partialCm)
    assert(nv.as[Long].collect().toSet == Set(1L, 3L, 4L, 5L))
    assert(ne.as[(Long, Long)].collect().toSet == Set((1L, 1L), (1L, 3L), (5L, 5L)))
  }

  test("test_contracted_to_simple_graph_02: weighted contraction sums " +
      "parallel-edge weights") {
    val we = sevenE.withColumn("weight", lit(1L))
    val (_, ne) = Graphs.contractToWeightedSimpleGraph(fiveV, we, partialCm)
    val got = ne.as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 3L), (1L, 3L, 2L), (5L, 5L, 2L)))
  }

  private val modularityEdges = Seq(
    (1L, 2L, 5.0), (2L, 1L, 5.0), (3L, 4L, 5.0), (4L, 3L, 5.0),
    (1L, 4L, 15.0), (4L, 1L, 15.0), (5L, 1L, 0.5), (5L, 4L, 0.5),
    (1L, 5L, 0.5), (4L, 5L, 0.5)).toDF("u", "v", "weight")

  test("test_exact_modularity_01: singleton clustering scores -0.3296967456 " +
      "(round 10, half-even)") {
    val singletons = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L))
      .toDF("vid", "c")
    val got = Graphs.exactModularity(modularityEdges, singletons, roundDigits = 10)
      .head.getDouble(0)
    assert(got == -0.3296967456)
  }

  test("test_exact_modularity_02: clustering {1,4} together scores " +
      "-0.063609467 (round 9)") {
    val cm = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 1L), (5L, 5L))
      .toDF("vid", "c")
    val got = Graphs.exactModularity(modularityEdges, cm, roundDigits = 9)
      .head.getDouble(0)
    assert(got == -0.063609467)
  }

  test("louvain one-step contract (test_graphs.py:565-728 invariant): our " +
      "louvain clustering never scores below the singleton clustering") {
    // the reference pins IMPROVEMENT, not identical assignments (its own
    // comment: a randomized function, only the better-modularity rule holds)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L)).toDF("src", "dst")
    val we = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .withColumn("weight", lit(1.0))
    val verts = we.select(col("u").as("vid")).distinct()
    val singletons = verts.select(col("vid"), col("vid").as("c"))
    val base = Graphs.exactModularity(we, singletons, 12).head.getDouble(0)
    // louvainAuto (modularity-tracked multilevel) — the one-level synchronous
    // pass can park in an oscillation state on a graph this small (D8)
    val communities = Graphs.louvainAuto(edges)
      .select(col("vertex").as("vid"), col("community").as("c"))
    val after = Graphs.exactModularity(we, communities, 12).head.getDouble(0)
    assert(after >= base, s"louvain modularity $after < singleton $base")
    assert(after > 0.3, s"expected real communities, got modularity $after")
  }

  test("exactModularity r17-review pins: integer weights sum cleanly, a " +
      "vertex missing from the clustering fails loudly, empty edges -> 0") {
    val longW = modularityEdges.withColumn("weight", col("weight").cast("long") + 1)
    // integer weights: no ClassCastException, a real number comes back
    assert(!Graphs.exactModularity(longW,
      Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L)).toDF("vid", "c"),
      6).head.isNullAt(0))
    // missing vertex = the reference's C.ix KeyError, not a silent drop
    val partial = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("vid", "c")
    val e = intercept[Exception] {
      Graphs.exactModularity(modularityEdges, partial, 6).head
    }
    assert(SparkTestBase.causeMessages(e)
      .exists(_.contains("exact_modularity: vertex missing from clustering")))
    // empty edge list: m = 0, no NPE
    val none = modularityEdges.limit(0)
    Graphs.exactModularity(none, Seq((1L, 1L)).toDF("vid", "c"), 6).head
  }
}
