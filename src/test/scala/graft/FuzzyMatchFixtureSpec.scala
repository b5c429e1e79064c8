package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Replays of the reference's fuzzy_match fixtures (tests/test_fuzzy_join.py,
  * r16 decode of stdlib/ml/smart_table_ops/_fuzzy_join.py): popularity-
  * normalized feature weights (WEIGHT = 1/2^⌈log2 cnt⌉ over BOTH sides'
  * edges), pair score = Σ shared features, the heavy/light threshold that
  * stops hot features from GENERATING pairs while still contributing to
  * light-made ones, and mutual-argmax selection. Tie ORDER among equal-
  * weight pairs follows the engine's id order in the reference (hash
  * pointers) and value order here — tie-bound vectors assert the invariant
  * (weight + mutual-best), unique-structure vectors assert exact tables. */
class FuzzyMatchFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def feat(rows: (String, Double, String)*): DataFrame =
    rows.toDF("feature", "weight", "norm_type")
  private def edges(rows: (String, String, Double)*): DataFrame =
    rows.toDF("node", "feature", "weight")

  test("test_fuzzy_match_simple: disjoint single-feature nodes pair at 0.5") {
    val f = feat(("1", 1.0, "weight"), ("2", 1.0, "weight"), ("3", 1.0, "weight"))
    val l = edges(("a", "1", 1.0), ("b", "2", 1.0), ("c", "3", 1.0))
    val r = edges(("AA", "1", 1.0), ("BB", "2", 1.0), ("CC", "3", 1.0))
    val out = TextOps.fuzzyMatch(l, r, f)
      .collect().map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
    assert(out == Set(("a", "AA", 0.5), ("b", "BB", 0.5), ("c", "CC", 0.5)))
  }

  test("test_fuzzy_match_same_features: identical edge sets give the diagonal at 0.5") {
    val f = feat(("1", 1.0, "weight"), ("2", 1.0, "weight"), ("3", 1.0, "weight"))
    val e = edges(("a", "1", 1.0), ("b", "2", 1.0), ("c", "3", 1.0))
    val out = TextOps.fuzzyMatch(e, e, f)
      .collect().map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
    assert(out == Set(("a", "a", 0.5), ("b", "b", 0.5), ("c", "c", 0.5)))
  }

  test("test_fuzzy_match_many_to_many: cnt=20 normalizes to 1/32; survivors are mutual-best") {
    val f = feat(("1", 1.0, "weight"))
    val l = edges((0 to 9).map(i => (i.toString, "1", 1.0)): _*)
    val r = edges((10 to 19).map(i => (i.toString, "1", 1.0)): _*)
    val out = TextOps.fuzzyMatch(l, r, f)
      .collect().map(x => (x.getString(0), x.getString(1), x.getDouble(2)))
    assert(out.nonEmpty)
    assert(out.forall(_._3 == 0.03125), out.mkString("; ")) // 1/2^ceil(log2 20)
    // each surviving right appears once (per-right argmax collapsed)
    assert(out.map(_._2).distinct.length == out.length)
  }

  test("test_fuzzy_self_match_simple: the shared light feature pairs a-b at 0.5") {
    val f = feat(("1", 1.0, "weight"), ("2", 1.0, "weight"), ("3", 1.0, "weight"))
    val e = edges(("a", "1", 1.0), ("a", "2", 1.0), ("b", "2", 1.0), ("c", "3", 1.0))
    val out = TextOps.fuzzySelfMatch(e, f)
      .collect().map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
    assert(out == Set(("a", "b", 0.5)))
  }

  test("heavy features never GENERATE pairs but still contribute to light-made ones") {
    // threshold 3: feature H has cnt 4 (heavy), L has cnt 2 (light).
    // x/y share BOTH; u/v share ONLY the heavy one.
    val f = feat(("H", 1.0, "weight"), ("L", 1.0, "weight"))
    val l = edges(("x", "H", 1.0), ("x", "L", 1.0), ("u", "H", 1.0))
    val r = edges(("y", "H", 1.0), ("y", "L", 1.0), ("v", "H", 1.0))
    val out = TextOps.fuzzyMatch(l, r, f, heavyLightThreshold = 3L)
      .collect().map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
    // light L: cnt 2 → 1/2; heavy H: cnt 4 → 1/4 added onto the (x,y) pair;
    // u/v share ONLY the heavy feature so they generate NO pair at all
    assert(out == Set(("x", "y", 0.75)))
    // contrast: on a graph where u/v's shared feature is LIGHT, they match
    val l2 = edges(("u", "H", 1.0)); val r2 = edges(("v", "H", 1.0))
    val out2 = TextOps.fuzzyMatch(l2, r2, feat(("H", 1.0, "weight")))
      .collect().map(x => (x.getString(0), x.getString(1), x.getDouble(2))).toSet
    assert(out2 == Set(("u", "v", 0.5))) // cnt 2 → 1/2
    // and with the threshold at 1 every feature is heavy → empty result
    assert(TextOps.fuzzyMatch(l2, r2, feat(("H", 1.0, "weight")),
      heavyLightThreshold = 1L).count() == 0L)
  }

  test("logweight and none normalizations follow the reference formulas") {
    // cnt = 4 edges on the feature → logweight 1/ceil(log2 5) = 1/3; none = 4
    val l = edges(("a", "1", 1.0), ("b", "1", 1.0))
    val r = edges(("c", "1", 1.0), ("d", "1", 1.0))
    val lw = TextOps.fuzzyMatch(l, r, feat(("1", 1.0, "logweight")))
      .collect().map(_.getDouble(2))
    assert(lw.nonEmpty && lw.forall(_ == 1.0 / 3.0), lw.mkString(","))
    val nw = TextOps.fuzzyMatch(l, r, feat(("1", 1.0, "none")))
      .collect().map(_.getDouble(2))
    assert(nw.nonEmpty && nw.forall(_ == 4.0), nw.mkString(","))
  }
}
