package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Jar-gated lake-format round-trips (reference `io/deltalake`, `io/iceberg`:
  * lakes treated as streaming queues / upsert targets). The container's
  * offline cache has NO delta-spark or iceberg-spark-runtime artifacts
  * (BASELINE.md r7 jar-absence record), so these specs `assume`-skip today —
  * but SparkTestBase configures the extension + catalog automatically the
  * moment the jar is on the classpath, so dropping a jar in makes them run
  * with zero code change: the one-step verification path for the two
  * "partial/untested" connector rows. */
class LakeFormatSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("delta round-trip + append (auto-enables when delta-spark jar present)") {
    assume(SparkTestBase.deltaPresent,
      "delta-spark jar absent from classpath (BASELINE.md jar-absence record)")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-delta").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("delta").mode("overwrite").save(dir)
    Seq((3L, "c")).toDF("id", "v")
      .write.format("delta").mode("append").save(dir)
    val back = spark.read.format("delta").load(dir)
      .as[(Long, String)].collect().toSet
    assert(back == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("delta as a streaming queue: readStream sees appended batches " +
      "(auto-enables when delta-spark jar present)") {
    assume(SparkTestBase.deltaPresent,
      "delta-spark jar absent from classpath (BASELINE.md jar-absence record)")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-delta-q").toString + "/q"
    Seq((1L, "a")).toDF("id", "v").write.format("delta").save(dir)
    Seq((2L, "b")).toDF("id", "v").write.format("delta").mode("append").save(dir)
    // the reference's deltalake connector consumes the table AS a queue:
    // every committed version's rows arrive as streamed input
    val q = spark.readStream.format("delta").load(dir)
      .writeStream.format("memory").queryName("delta_queue")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("delta_queue").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")))
  }

  test("iceberg round-trip via hadoop catalog (auto-enables when iceberg jar present)") {
    assume(SparkTestBase.icebergPresent,
      "iceberg-spark-runtime jar absent from classpath (BASELINE.md jar-absence record)")
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_iceberg.db")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .writeTo("graft_iceberg.db.t").createOrReplace()
    Seq((3L, "c")).toDF("id", "v").writeTo("graft_iceberg.db.t").append()
    val back = spark.table("graft_iceberg.db.t").as[(Long, String)].collect().toSet
    assert(back == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }
}
