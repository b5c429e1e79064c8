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
}
