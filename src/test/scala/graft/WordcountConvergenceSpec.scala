package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming wordcount convergence — the reference's own in-tree baseline
  * harness (integration_tests/wordcount/base.py:345-393): stream a corpus of
  * words, maintain `groupBy(word).count()`, and declare the run FAILED if the
  * output has not converged to the exact expected counts within the 180 s
  * no-output rule. Here the corpus arrives in chunks through a MemoryStream
  * (multiple real micro-batches) and convergence is exact-multiset equality
  * against the closed-form expectation. */
class WordcountConvergenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("streaming wordcount converges to exact counts within the 180 s rule") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vocab = 101
    val total = 30000L
    val input = MemoryStream[Long]
    val counts = input.toDS()
      .select(concat(lit("w"), col("value") % vocab).as("word"))
      .groupBy("word").count()
    val t0 = System.nanoTime()
    val q = counts.writeStream.format("memory").queryName("wc_conv")
      .outputMode("complete").start()
    try {
      // chunked arrival → several micro-batches, not one availableNow gulp
      (0L until total).grouped(5000).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val got = spark.table("wc_conv").as[(String, Long)].collect().toMap
      val expected = (0 until vocab).map { w =>
        s"w$w" -> (total / vocab + (if (w < total % vocab) 1 else 0))
      }.toMap
      val elapsed = (System.nanoTime() - t0) / 1e9
      assert(got == expected, s"counts diverged: got ${got.size} words")
      assert(elapsed < 180.0, s"convergence took $elapsed s (>180 s rule)")
    } finally q.stop()
  }
}
