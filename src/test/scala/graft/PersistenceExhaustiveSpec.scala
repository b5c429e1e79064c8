package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Persistence

/** Replay of `integration_tests/common/test_persistence.py` — the
  * reference's EXHAUSTIVE persistence harness: every non-isomorphic
  * sequence of file upserts/deletes split across persisted runs of an
  * identity program, with a final "compression round" that re-upserts
  * every object ever seen and runs once more. The generator here is the
  * same recursion with the same three parameterizations:
  * (5 ops, 3 files, no replacements) + (4, 3, with replacements) +
  * (6, 4, no replacements, prefix [1,2]) = 749 scenarios.
  *
  * The always-on test replays a deterministic 1-in-12 sample (63
  * scenarios, every family represented); `SPARK_GRAFT_EXHAUSTIVE=1` runs
  * all 749 (~15 min — the full sweep is recorded in BASELINE.md r17).
  */
class PersistenceExhaustiveSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** integration_tests/common/test_persistence.py:10 generate_test_scenarios,
    * ported token for token. Positive = upsert file N, negative = delete
    * file N, zero = a persisted run happens. */
  private def generate(maxLength: Int, maxFiles: Int, allowReplacements: Boolean,
      prefix: List[Int] = Nil): Vector[List[Int]] = {
    val out = Vector.newBuilder[List[Int]]
    def construct(sequence: List[Int], nActions: Int): Unit = {
      if (nActions == maxLength) { out += sequence :+ 0; return }
      var maxNumber = 0
      val present = scala.collection.mutable.Set[Int]()
      for (n <- sequence) {
        maxNumber = math.max(maxNumber, math.abs(n))
        if (n > 0) present += n else if (n < 0) present -= (-n)
      }
      if (maxNumber + 1 <= maxFiles) construct(sequence :+ (maxNumber + 1), nActions + 1)
      for (number <- 0 until maxNumber) {
        val cand = number + 1
        val skip = sequence.nonEmpty && cand <= math.abs(sequence.last)
        if (!skip) {
          if (allowReplacements || !present.contains(cand))
            construct(sequence :+ cand, nActions + 1)
          if (present.contains(cand))
            construct(sequence :+ (-cand), nActions + 1)
        }
      }
      if (sequence.nonEmpty && sequence.last != 0) construct(sequence :+ 0, nActions)
    }
    construct(prefix, prefix.count(_ != 0))
    out.result()
  }

  private def replay(scenario: List[Int]): Unit = {
    val state = java.nio.file.Files.createTempDirectory("graft-pex").toString
    var nUpserts = 0
    val files = scala.collection.mutable.LinkedHashMap[String, String]()
    val expAdd = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val expDel = scala.collection.mutable.ArrayBuffer[(String, String)]()
    // scenario + compression round: re-upsert every object ever seen, run again
    val allIds = scenario.filter(_ > 0).distinct
    val full = scenario ++ List(0) ++ allIds ++ List(0)
    for (token <- full) {
      val name = math.abs(token).toString
      if (token > 0) {
        nUpserts += 1
        val contents = "a" * nUpserts
        files.remove(name).foreach(old => expDel += ((name, old)))
        files(name) = contents
        expAdd += ((name, contents))
      } else if (token < 0) {
        expDel += ((name, files.remove(name).get))
      } else {
        val cur = files.toSeq.map { case (n, c) => (n, c) }.toDF("name", "data")
        val got = Persistence.runStatic(state, cur).collect()
          .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
        val gotAdd = got.collect { case (n, c, 1) => (n, c) }.sorted.toSeq
        val gotDel = got.collect { case (n, c, -1) => (n, c) }.sorted.toSeq
        assert(gotAdd == expAdd.sorted.toSeq && gotDel == expDel.sorted.toSeq,
          s"scenario $scenario at token-run: +$gotAdd/-$gotDel vs " +
            s"+${expAdd.sorted}/-${expDel.sorted}")
        expAdd.clear(); expDel.clear()
      }
    }
  }

  private lazy val scenarios: Vector[List[Int]] =
    generate(5, 3, allowReplacements = false) ++
      generate(4, 3, allowReplacements = true) ++
      generate(6, 4, allowReplacements = false, prefix = List(1, 2))

  test("exhaustive persisted-run scenarios: deterministic 1-in-12 sample of " +
      "the reference's 749 generated sequences (integration_tests/common/" +
      "test_persistence.py)") {
    assert(scenarios.size == 749, s"generator drift: ${scenarios.size}")
    val sample = scenarios.zipWithIndex.collect { case (s, i) if i % 12 == 0 => s }
    sample.foreach(replay)
  }

  test("exhaustive persisted-run scenarios: ALL 749 (gated on " +
      "SPARK_GRAFT_EXHAUSTIVE=1)") {
    assume(sys.env.get("SPARK_GRAFT_EXHAUSTIVE").contains("1"),
      "set SPARK_GRAFT_EXHAUSTIVE=1 for the full sweep")
    scenarios.foreach(replay)
  }
}
