package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{PwColumnDef, PwSchema}

/** Declared schemas (reference internals/schema.py:281): dtype conformance,
  * default_value fill, primary-key keying, append-only propagation. */
class PwSchemaSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val schema = PwSchema(Seq(
    PwColumnDef("id", LongType, primaryKey = true, appendOnly = true),
    PwColumnDef("name", StringType, appendOnly = true),
    PwColumnDef("score", DoubleType, defaultValue = Some(0.0))))

  test("attach casts, reorders, and fills missing columns with defaults") {
    val df = Seq(("7", "ann"), ("8", "bob")).toDF("id", "name")
    val out = schema.attach(df)
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      Seq(("id", LongType), ("name", StringType), ("score", DoubleType)))
    assert(out.as[(Long, String, Double)].collect().toSet ==
      Set((7L, "ann", 0.0), (8L, "bob", 0.0)))
  }

  test("attach fails fast on a missing column without default") {
    val df = Seq((1L, 0.5)).toDF("id", "score")
    val e = intercept[IllegalArgumentException](schema.attach(df))
    assert(e.getMessage.contains("name"))
  }

  test("keyed derives the pointer id from declared primary-key columns") {
    val t = schema.keyed(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "score"))
    assert(t.df.columns.contains(graft.core.Keys.IdCol))
    assert(t.df.select(graft.core.Keys.IdCol).distinct.count() == 2)
  }

  test("append-only flags survive select/filter/rename/join, die on aggregate") {
    val df = schema.attach(Seq((1L, "a", 1.0)).toDF("id", "name", "score"))
    assert(PwSchema.appendOnlyColumns(df).toSet == Set("id", "name"))

    val transformed = df.filter(col("score") >= 0)
      .select(col("id"), col("name"))
      .withColumnRenamed("name", "label")
    assert(PwSchema.appendOnlyColumns(transformed).toSet == Set("id", "label"))
    PwSchema.assertAppendOnly(transformed, "id", "label")

    val joined = transformed.join(df.select(col("id"), col("score")), "id")
    assert(PwSchema.appendOnlyColumns(joined).contains("id"))

    val agged = df.groupBy("name").agg(sum("score").as("s"))
    assert(PwSchema.appendOnlyColumns(agged).isEmpty ||
      !PwSchema.appendOnlyColumns(agged).contains("s"))
    val e = intercept[IllegalArgumentException](PwSchema.assertAppendOnly(agged, "s"))
    assert(e.getMessage.contains("append-only"))
  }
}
