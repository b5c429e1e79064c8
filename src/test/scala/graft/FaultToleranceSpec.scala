package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Task-retry determinism: on a 1000-executor cluster tasks FAIL — spot
  * loss, OOM kills, disk faults — and Spark re-runs them. A result is only
  * correct at scale if a retried task reproduces exactly what the lost task
  * would have computed. These specs inject a first-attempt failure into
  * EVERY task of a pipeline stage (local[4, 2] allows one retry) and assert
  * the output is bit-identical to the healthy run — the property the
  * engine's hash-deterministic / integer-exact design exists to guarantee.
  */
object FaultInjection {
  /** Identity on a long column that throws on each task's FIRST attempt. */
  val poison = udf { (x: Long) =>
    val tc = TaskContext.get()
    if (tc != null && tc.attemptNumber() == 0)
      throw new RuntimeException(s"injected fault (stage ${tc.stageId()}, " +
        s"partition ${tc.partitionId()})")
    x
  }.asNondeterministic()
}

class FaultToleranceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def corpus: DataFrame =
    (0L until 60L).map { i =>
      (i, s"shared prefix tokens doc $i tail ${"word " * (i % 5).toInt}")
    }.toDF("doc_id", "text")

  /** Run `build` over the corpus twice — healthy, then with every task of
    * the input stage failing its first attempt — and require identical
    * sorted results. */
  private def retryStable(build: DataFrame => DataFrame): Unit = {
    val healthy = build(corpus).collect().map(_.toString).sorted.toSeq
    val injected = corpus
      .withColumn("doc_id", FaultInjection.poison(col("doc_id")))
    val retried = build(injected).collect().map(_.toString).sorted.toSeq
    assert(healthy.nonEmpty, "fixture must produce rows")
    assert(retried == healthy, "retried run must be bit-identical")
  }

  test("groupBy aggregation survives first-attempt task failures bit-exactly") {
    retryStable(d => d.groupBy(col("doc_id") % 7).agg(
      count(lit(1)).as("n"), sum(length(col("text"))).as("chars")))
  }

  test("MinHash-LSH dedup is retry-deterministic (hash-derived, no RNG state)") {
    retryStable(d => graft.operators.Dedup.minhashLsh(
      d, col("doc_id"), col("text")))
  }

  test("DSIR weights are retry-deterministic (integer micro-unit sums)") {
    retryStable { d =>
      val target = corpus.filter(col("doc_id") % 3 === 0)
      graft.operators.TrainPrep.dsirWeights(
        d, target, col("doc_id"), col("text"), buckets = 256)
    }
  }

  test("window aggregation + join pipeline is retry-deterministic") {
    retryStable { d =>
      val sized = d.select(col("doc_id"), length(col("text")).as("len"))
      val agg = sized.groupBy((col("doc_id") % 5).as("g"))
        .agg(max("len").as("mx"))
      sized.join(broadcast(agg), col("doc_id") % 5 === col("g"))
        .filter(col("len") === col("mx"))
        .select("doc_id", "len")
    }
  }

  test("a fault on EVERY attempt still fails the job loudly (no silent loss)") {
    val alwaysFail = udf { (_: Long) =>
      throw new RuntimeException("permanent fault"); 0L
    }.asNondeterministic()
    val e = intercept[Exception] {
      corpus.withColumn("doc_id", alwaysFail(col("doc_id")))
        .groupBy("doc_id").count().collect()
    }
    assert(SparkTestBase.causeMessages(e).exists(_.contains("permanent fault")))
  }
}
