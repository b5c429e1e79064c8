package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.functions.CrossHash
import graft.operators.{Dedup, Hmm, HmmModel}

/** Property tests over the semantics-critical kernels (SURVEY §5 plan:
  * scalacheck generators for kernel laws rather than fixed goldens). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("CrossHash: JVM twin equals the SQL expression on arbitrary strings") {
    val strs = Gen.listOfN(40, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.asciiPrintableStr.map(_.take(12)),
      Gen.const(""), Gen.const(" "), Gen.const("héllo wörld"))).sample.get
    val df = strs.distinct.toDF("s")
    val sqlSide = df.select(col("s"), CrossHash.md5Long(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    strs.distinct.foreach { s =>
      assert(sqlSide(s) == CrossHash.md5LongJvm(s), s"mismatch for '$s'")
    }
  }

  test("jaccard expression equals the set definition on random shingle sets") {
    val gen = for {
      a <- Gen.listOf(Gen.choose(0, 30))
      b <- Gen.listOf(Gen.choose(0, 30))
    } yield (a.distinct, b.distinct)
    val cases = Gen.listOfN(30, gen).sample.get.filter { case (a, b) => a.nonEmpty || b.nonEmpty }
    val df = cases.zipWithIndex.map { case ((a, b), i) => (i, a, b) }.toDF("i", "a", "b")
    val got = df.select(col("i"), Dedup.jaccard(col("a"), col("b")).as("j"))
      .as[(Int, Double)].collect().toMap
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      val expect = a.toSet.intersect(b.toSet).size.toDouble / a.toSet.union(b.toSet).size
      assert(got(i) == expect, s"case $i: $a $b")
    }
  }

  test("viterbi equals brute-force argmax on random 2/3-state models") {
    // 30 seeded random models: dyadic log-scores keep the comparison exact
    for (seed <- 0 until 30) {
      val rnd = new scala.util.Random(7919L * seed + 13)
      val states = if (seed % 2 == 0) Seq("A", "B") else Seq("A", "B", "C")
      val obsLen = 1 + rnd.nextInt(5)
      def s(): Double = -rnd.nextInt(17) / 4.0
      val obsAlphabet = Seq("x", "y", "z")
      val model = HmmModel(states,
        states.map(_ -> s()).toMap,
        (for (a <- states; b <- states) yield (a, b) -> s()).toMap,
        (for (a <- states; o <- obsAlphabet) yield (a, o) -> s()).toMap)
      val obs = Seq.fill(obsLen)(obsAlphabet(rnd.nextInt(3)))
      // brute force over all |S|^n paths with the same tie-break (lex path)
      def all(n: Int): Seq[List[String]] =
        if (n == 0) Seq(Nil) else for (p <- all(n - 1); st <- states) yield st :: p
      def score(path: Seq[String]): Double =
        model.start(path.head) + model.emit(path.head, obs.head) +
          path.sliding(2).zip(obs.tail.iterator).collect {
            case (Seq(a, b), o) => model.trans(a, b) + model.emit(b, o)
          }.sum
      val best = all(obsLen).map(_.reverse)
        .map(p => (p, score(p)))
        .sortBy { case (p, sc) => (-sc, p.mkString(",")) }.head
      val got = Hmm.viterbi(model, obs)
      assert(score(got) == best._2, s"score mismatch: $obs $got vs $best")
    }
  }

  test("pointerFrom is stable and injective-in-practice on distinct tuples") {
    val df = (0L until 2000L).map(i => (i, s"k$i")).toDF("a", "b")
    val ids = df.select(graft.core.Keys.pointerFrom(col("a"), col("b")).as("id"))
    assert(ids.distinct.count() == 2000)
    val again = df.select(graft.core.Keys.pointerFrom(col("a"), col("b")).as("id"))
    assert(ids.exceptAll(again).isEmpty)
  }

  test("mixturePlanFilled invariants on random inventories and weights") {
    import graft.operators.TrainPrep
    val gen = for {
      g <- Gen.choose(2, 6)
      toks <- Gen.listOfN(g, Gen.choose(10L, 5000L))
      ws <- Gen.listOfN(g, Gen.choose(1, 20))
      budget <- Gen.choose(50L, 20000L)
      epochs <- Gen.oneOf(1.0, 2.0)
    } yield (toks, ws.map(_.toDouble / ws.sum), budget.toDouble, epochs)
    // seeded draw: a failing input must be replayable (repo-wide
    // bit-reproducibility discipline)
    Gen.listOfN(12, gen)(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(0xD51AL)).get.foreach { case (toks, ws, budget, epochs) =>
      val corpus = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("src", "nw")
      val targets = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("src", "w")
      val plan = TrainPrep.mixturePlanFilled(corpus, col("src"), col("nw"),
        targets, budget, epochs)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(5)))
      val caps = plan.map(_._2).sum
      val selTot = plan.map(_._3).sum
      // budget exhausted up to flooring, never exceeding caps or budget
      assert(selTot <= math.min(budget, caps.toDouble) + 0.5)
      assert(selTot >= math.min(budget, caps.toDouble) - plan.length,
        s"under-spend beyond flooring: sel=$selTot budget=$budget caps=$caps")
      plan.foreach { case (_, cap, sel, sat) =>
        assert(sel <= cap, "selection never exceeds a source cap")
        assert(sat == (sel >= cap), s"saturated flag consistent (sel=$sel cap=$cap)")
      }
      // unsaturated sources keep the target ratio among themselves
      val unsat = plan.filterNot(_._4)
      if (unsat.length >= 2 && unsat.forall(_._3 > 100)) {
        val wOf = targets.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val ratios = unsat.map { case (s, _, sel, _) => sel.toDouble / wOf(s) }
        assert(ratios.max / ratios.min < 1.05,
          s"unsaturated sources must honor the mixture: $ratios")
      }
    }
  }

  test("dsirWeights edge cases: empty target, single-word docs, empty raw") {
    import graft.operators.TrainPrep
    val raw = Seq((1L, "alpha"), (2L, "beta gamma")).toDF("doc_id", "text")
    val empty = raw.limit(0)
    // empty target: every bucket ratio is ln(uniform) − ln(raw) — finite,
    // weights defined for all docs
    val w = TrainPrep.dsirWeights(raw, empty, col("doc_id"), col("text"), 64)
      .collect()
    assert(w.length == 2 && w.forall(r => !r.isNullAt(1)))
    // empty raw: no weights, no crash
    assert(TrainPrep.dsirWeights(empty, raw, col("doc_id"), col("text"), 64)
      .collect().isEmpty)
    // blank text never reaches the gram explode
    val blank = Seq((3L, "   ")).toDF("doc_id", "text")
    assert(TrainPrep.dsirWeights(blank, raw, col("doc_id"), col("text"), 64)
      .collect().isEmpty)
  }
}
