package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: the driver-contract surface stays callable. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val q = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(q)
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("all queries run and return rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.SfDir).count()
      assert(n > 0, s"query $name returned no rows")
    }
  }
}
