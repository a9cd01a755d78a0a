package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of join: latest snapshot at-or-before each event, null before first") {
    val events = Seq(
      (1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 250L), (4L, 10L, 400L),
      (5L, 20L, 150L))
      .toDF("event_id", "user_id", "us")
    val snaps = Seq(
      (10L, 200L, 2.0), // exactly at event 2's ts -> visible to it
      (10L, 300L, 3.0))
      .toDF("user_id", "us", "snap_value")
    val got = AsOf.asofJoin(events, snaps, "user_id", "us", Seq("snap_value"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("snap_value")).map(_.doubleValue))
      .toMap
    assert(got === Map(
      1L -> None,        // before first snapshot
      2L -> Some(2.0),   // <= boundary: snapshot at same ts counts
      3L -> Some(2.0),   // carried forward
      4L -> Some(3.0),   // superseded by the later snapshot
      5L -> None))       // other key has no snapshots
  }

  test("colliding right timestamps resolve deterministically to the max payload") {
    val events = Seq((1L, 10L, 250L), (2L, 10L, 350L))
      .toDF("event_id", "user_id", "us")
    // three snapshots at the SAME (user, ts): any partitioning must
    // yield the max payload struct, never an arbitrary survivor
    val snaps = Seq(
      (10L, 200L, 5.0), (10L, 200L, 9.0), (10L, 200L, 7.0),
      (10L, 300L, 1.0))
      .toDF("user_id", "us", "snap_value")
      .repartition(4) // scramble row order across partitions
    val got = AsOf.asofJoin(events, snaps, "user_id", "us", Seq("snap_value"))
      .collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("snap_value"))
      .toMap
    assert(got === Map(
      1L -> 9.0,  // max of the colliding 200-ts snapshots
      2L -> 1.0)) // later snapshot supersedes regardless
  }
}
