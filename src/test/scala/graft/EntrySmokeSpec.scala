package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: `SparkEntry.entry` on sf0.001 returns rows. */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  test("SparkEntry.entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
