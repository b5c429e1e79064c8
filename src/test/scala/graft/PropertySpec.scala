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
}
