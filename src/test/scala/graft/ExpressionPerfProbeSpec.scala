package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Exprs._

/** Throughput probe for the r16 expression kernels vs their Spark builtin
  * baselines at 10M rows — gated behind SPARK_GRAFT_PROBE=1 (it is a
  * measurement, not a correctness gate; results recorded in BASELINE.md).
  * Run: SPARK_GRAFT_PROBE=1 sbt "testOnly graft.ExpressionPerfProbeSpec" */
class ExpressionPerfProbeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("10M-row throughput: chrono strftime/strptime, PyArith, PyRound vs builtins") {
    assume(sys.env.get("SPARK_GRAFT_PROBE").contains("1"), "probe is opt-in")
    val n = 10000000L
    def time(name: String)(f: => Long): Unit = {
      f // warm (codegen + JIT)
      val t0 = System.nanoTime; val r = f; val dt = (System.nanoTime - t0) / 1e9
      info(f"PROBE $name%-24s ${n / dt / 1e6}%8.1f Mrows/s ($dt%5.2f s, check=$r)")
      println(f"PROBE $name%-24s ${n / dt / 1e6}%8.1f Mrows/s ($dt%5.2f s, check=$r)")
    }
    val ts = spark.range(n).select(
      timestamp_micros(col("id") * 1000000L + 123456L).cast("timestamp_ntz").as("t"))
    ts.count()
    time("strftime_chrono") {
      ts.select(col("t").dt.strftime("%Y-%m-%d %H:%M:%S").as("s"))
        .agg(sum(length(col("s")))).head.getLong(0)
    }
    time("date_format_builtin") {
      ts.select(date_format(col("t"), "yyyy-MM-dd HH:mm:ss").as("s"))
        .agg(sum(length(col("s")))).head.getLong(0)
    }
    val strs = ts.select(date_format(col("t"), "yyyy-MM-dd HH:mm:ss").as("s"))
    time("strptime_chrono") {
      strs.select(col("s").dt.strptime("%Y-%m-%d %H:%M:%S")
        .cast("timestamp_ltz").as("t2"))
        .agg(sum(unix_seconds(col("t2")))).head.getLong(0)
    }
    time("to_timestamp_builtin") {
      strs.select(to_timestamp(col("s"), "yyyy-MM-dd HH:mm:ss")
        .cast("timestamp_ltz").as("t2"))
        .agg(sum(unix_seconds(col("t2")))).head.getLong(0)
    }
    val nums = spark.range(n)
      .select((col("id") - 5000000L).as("a"), (col("id") % 97L + 1L).as("b"))
    time("floorDiv_pyarith") {
      nums.select(col("a").floorDiv(col("b")).as("q")).agg(sum("q")).head.getLong(0)
    }
    time("div_builtin") {
      nums.select(call_function("div", col("a"), col("b")).as("q"))
        .agg(sum("q")).head.getLong(0)
    }
    time("pyround") {
      nums.select((col("a").cast("double") / 97.0).num.round(2).as("r"))
        .agg(sum("r").cast("long")).head.getLong(0)
    }
    time("bround_builtin") {
      nums.select(bround(col("a").cast("double") / 97.0, 2).as("r"))
        .agg(sum("r").cast("long")).head.getLong(0)
    }
  }
}
