package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketized range join equals the naive inequality join, no duplicates") {
    val points = (0L until 500L).map(i => (i, i * 7L)).toDF("pid", "ts")
    val intervals = Seq(
      (1L, 0L, 100L), (2L, 50L, 60L), (3L, 90L, 3500L), (4L, 4000L, 4001L),
      (5L, 3490L, 3500L)) // overlapping + exact-boundary cases
      .toDF("iid", "s", "e")
    val naive = points.join(intervals,
      col("ts") >= col("s") && col("ts") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val bucketed = RangeJoin.bucketed(points, intervals, "ts", "s", "e", width = 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bucketed.length === naive.length, "duplicate or missing matches")
    assert(bucketed.sorted.sameElements(naive.sorted))
  }

  test("width larger than every interval still works (explosion factor 1-2)") {
    val points = (0L until 100L).map(i => (i, i)).toDF("pid", "ts")
    val intervals = Seq((1L, 10L, 20L)).toDF("iid", "s", "e")
    val got = RangeJoin.bucketed(points, intervals, "ts", "s", "e", width = 1000L)
      .count()
    assert(got === 11)
  }
}
