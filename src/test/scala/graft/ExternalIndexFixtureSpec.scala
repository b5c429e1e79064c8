package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Exprs._
import graft.operators.Similarity

/** Replays the reference's external-index fixtures
  * (tests/external_index/test_brute_force_knn.py) against
  * Similarity.knnQuery: the index score is the NEGATED distance, per-query
  * `limit` caps results, COS distance is 1 − cosine and L2SQ the squared
  * euclidean — expected tables carry distances rounded with the
  * reference's num.round (python half-even, our PyRound). The usearch
  * resize/space machinery (reserved/auxiliary space) is allocator
  * plumbing with no Spark analog — out of scope, documented. */
class ExternalIndexFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def index = (1 to 9).map(i => (i.toLong, Seq(i.toDouble, 0.1, 0.1)))
    .toDF("pk", "data")
  private def queries = (1 to 4).map(i => (i.toLong, Seq(0.5, 0.1, 0.1), i.toLong))
    .toDF("qpk", "data", "limit")

  private def run(metric: String): Set[(Long, Long, Double)] =
    Similarity.knnQuery(queries, col("qpk"), col("data"), col("limit"),
        index, col("pk"), col("data"), metric = metric)
      .select(col("query_id"), col("nn_id"),
        col("dist").num.round(2).as("distance"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("test_euclidean_sq_distance: L2SQ distances and per-query limits replay") {
    assert(run("l2sq") == Set(
      (1L, 1L, 0.25), (2L, 1L, 0.25), (2L, 2L, 2.25),
      (3L, 1L, 0.25), (3L, 2L, 2.25), (3L, 3L, 6.25),
      (4L, 1L, 0.25), (4L, 2L, 2.25), (4L, 3L, 6.25), (4L, 4L, 12.25)))
  }

  test("test_cosine_distance: COS = 1 - cosine, rounded like the reference") {
    assert(run("cosine") == Set(
      (1L, 1L, 0.01), (2L, 1L, 0.01), (2L, 2L, 0.02),
      (3L, 1L, 0.01), (3L, 2L, 0.02), (3L, 3L, 0.03),
      (4L, 1L, 0.01), (4L, 2L, 0.02), (4L, 3L, 0.03), (4L, 4L, 0.03)))
  }

  test("test_filter / test_optional_filter: per-query JMESPath globmatch filters (tantivy)") {
    // all items share one vector — only the filter drives the reply size
    val corpus = Seq(
      (1L, Seq(1.0), Map("path" -> "foo/bar/")),
      (2L, Seq(1.0), Map("path" -> "foo/foo/")),
      (3L, Seq(1.0), Map("path" -> "bar/bar/")),
      (4L, Seq(1.0), Map("path" -> "Eyjafjallajoekull"))).toDF("pk", "vec", "md")
    val qs = Seq(
      (1L, Seq(1.0), 4L, "globmatch(`\"**/foo/**\"`,path)"),
      (2L, Seq(1.0), 4L, "globmatch(`\"**/bar/**\"`,path)"),
      (3L, Seq(1.0), 4L, "path=='Eyjafjallajoekull'"),
      (4L, Seq(1.0), 4L, null)).toDF("qpk", "vec", "limit", "f")
    val got = Similarity.knnQuery(qs, col("qpk"), col("vec"), col("limit"),
        corpus, col("pk"), col("vec"),
        queryMetaFilter = Some((col("f"), col("md"))))
      .groupBy("query_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // test_filter expects 2/2/1 matches; the NULL filter row accepts all 4
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 4L))
  }

  test("test_incorrect_metadata_filter: an unparseable filter matches NOTHING") {
    val corpus = Seq((1L, Seq(1.0), Map("foo" -> "1"))).toDF("pk", "vec", "md")
    val qs = Seq((1L, Seq(1.0), 4L, "contains(foo)")).toDF("qpk", "vec", "limit", "f")
    val got = Similarity.knnQuery(qs, col("qpk"), col("vec"), col("limit"),
        corpus, col("pk"), col("vec"),
        queryMetaFilter = Some((col("f"), col("md"))))
    assert(got.count() == 0)
  }

  test("test_all_at_once_metadata_filter form: backtick numeric comparison (foo > `4`)") {
    val corpus = (0 to 9).map(i => (i.toLong, Seq(i.toDouble), Map("foo" -> i.toString)))
      .toDF("pk", "vec", "md")
    val qs = Seq((1L, Seq(0.0), 10L, "foo > `4`")).toDF("qpk", "vec", "limit", "f")
    val got = Similarity.knnQuery(qs, col("qpk"), col("vec"), col("limit"),
        corpus, col("pk"), col("vec"),
        queryMetaFilter = Some((col("f"), col("md"))))
      .select("nn_id").as[Long].collect().toSet
    assert(got == Set(5L, 6L, 7L, 8L, 9L))
  }
}
