package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Hmm, HmmModel}

/** Viterbi decoding verified against brute-force path enumeration (no golden
  * outputs — the property IS the definition: argmax over all state paths). */
class HmmSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // the reference docstring's manul HMM shape: 2 states, 2 observations
  private val model = HmmModel(
    states = Seq("HUNGRY", "FULL"),
    startLogProb = Map("HUNGRY" -> math.log(0.5), "FULL" -> math.log(0.5)),
    transLogProb = Map(
      ("HUNGRY", "HUNGRY") -> math.log(0.4), ("HUNGRY", "FULL") -> math.log(0.6),
      ("FULL", "HUNGRY") -> math.log(0.6), ("FULL", "FULL") -> math.log(0.4)),
    emitLogProb = Map(
      ("HUNGRY", "GRUMPY") -> math.log(0.9), ("HUNGRY", "HAPPY") -> math.log(0.1),
      ("FULL", "GRUMPY") -> math.log(0.7), ("FULL", "HAPPY") -> math.log(0.3)))

  private def bruteForce(obs: Seq[String]): Seq[String] = {
    def paths(n: Int): Seq[List[String]] =
      if (n == 0) Seq(Nil)
      else for (p <- paths(n - 1); s <- model.states) yield s :: p
    def score(path: Seq[String]): Double = {
      val emit = path.zip(obs).map { case (s, o) => model.emit(s, o) }.sum
      val trans = path.sliding(2).collect { case Seq(a, b) => model.trans(a, b) }.sum
      model.start(path.head) + emit + trans
    }
    paths(obs.length).map(_.reverse)
      .map(p => (p, score(p)))
      .sortBy { case (p, s) => (-s, p.mkString(",")) }
      .head._1
  }

  test("viterbi equals brute-force argmax over all paths") {
    val cases = Seq(
      Seq("HAPPY"),
      Seq("HAPPY", "HAPPY", "GRUMPY", "GRUMPY", "HAPPY", "GRUMPY"),
      Seq("GRUMPY", "GRUMPY", "GRUMPY"),
      Seq("HAPPY", "GRUMPY", "HAPPY", "GRUMPY", "HAPPY"))
    cases.foreach { obs =>
      assert(Hmm.viterbi(model, obs) == bruteForce(obs), s"obs=$obs")
    }
  }

  test("beam of full width changes nothing; beam 1 is greedy but valid") {
    val obs = Seq("HAPPY", "GRUMPY", "GRUMPY", "HAPPY")
    assert(Hmm.viterbi(model, obs, beamSize = Some(2)) == Hmm.viterbi(model, obs))
    assert(Hmm.viterbi(model, obs, beamSize = Some(1)).length == obs.length)
  }

  test("decode runs per key and preserves observation order") {
    val df = Seq(
      ("cat1", 1L, "HAPPY"), ("cat1", 2L, "GRUMPY"), ("cat1", 3L, "GRUMPY"),
      ("cat2", 1L, "GRUMPY")).toDF("cat", "t", "obs")
    val out = Hmm.decode(df, model, "cat", "t", "obs")
      .as[(String, Seq[String])].collect().toMap
    assert(out("cat1") == bruteForce(Seq("HAPPY", "GRUMPY", "GRUMPY")))
    assert(out("cat2") == bruteForce(Seq("GRUMPY")))
  }
}
