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

  /** The multi-resolution aggregate must equal the enumerate-then-
    * aggregate form EXACTLY — count and decimal-routed sum — on
    * intervals engineered to hit every decomposition branch: bucket-
    * aligned starts/ends, intervals inside one fine bucket, intervals
    * with no full coarse bucket, empty intervals (must emit nothing),
    * and boundary-inclusive ends.
    */
  test("intervalAggregate equals bucketed+groupBy on adversarial intervals") {
    import graft.functions.OracleSafe.decSum
    val points = (0L until 3000L).map(i => (i * 3L + 1L, (i % 17).toDouble / 4))
      .toDF("ts", "v")
    val intervals = Seq(
      (1L, 0L, 599L),      // aligned start, end one short of a fine edge
      (2L, 600L, 1199L),   // fine-aligned both ends (fine=60: full buckets)
      (3L, 7L, 11L),       // inside one fine bucket
      (4L, 55L, 65L),      // straddles one fine boundary, no full bucket
      (5L, 0L, 8999L),     // whole domain
      (6L, 8995L, 9020L),  // runs past the last point
      (7L, 9010L, 9020L),  // EMPTY (no point has ts > 9000 except 9001... )
      (8L, 240L, 3600L),   // coarse-aligned interior (fine*factor = 600)
      (9L, 601L, 3599L))   // both edges partial
      .toDF("iid", "s", "e")
    val want = RangeJoin.bucketed(points, intervals, "ts", "s", "e", width = 600L)
      .groupBy(col("iid"))
      .agg(count(lit(1)).as("n_points"), decSum(col("v")).as("total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val got = RangeJoin.intervalAggregate(points, intervals,
        "ts", "v", "iid", "s", "e", fine = 60L, factor = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(got.sameElements(want),
      s"multires diverged:\n got ${got.toSeq}\nwant ${want.toSeq}")
  }

  test("intervalAggregate equals the join form on 200 random intervals") {
    val rnd = new scala.util.Random(4242)
    val points = (0L until 5000L)
      .map(_ => (rnd.nextInt(100000).toLong, rnd.nextInt(400).toDouble / 8))
      .toDF("ts", "v")
    val intervals = (0L until 200L).map { i =>
      val s = rnd.nextInt(100000).toLong
      (i, s, s + rnd.nextInt(5000).toLong)
    }.toDF("iid", "s", "e")
    import graft.functions.OracleSafe.decSum
    val want = RangeJoin.bucketed(points, intervals, "ts", "s", "e", width = 700L)
      .groupBy(col("iid"))
      .agg(count(lit(1)).as("n_points"), decSum(col("v")).as("total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    for ((fine, factor) <- Seq((60L, 10), (100L, 7), (1L, 2), (997L, 3))) {
      val got = RangeJoin.intervalAggregate(points, intervals,
          "ts", "v", "iid", "s", "e", fine, factor)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      assert(got.sameElements(want), s"diverged at fine=$fine factor=$factor")
    }
  }
}
