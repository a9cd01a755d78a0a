package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.PageRank

/** PageRank invariants pinned against a driver-side replay of the
  * identical scaled-integer recurrence — the distributed plan must be
  * BIT-exact with the sequential fold (that is the whole point of the
  * integer formulation; the DuckDB twin relies on it).
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // a -> b (3), b -> a (1), a -> c (1), c -> a (2), d dangling
  private val nodeIds = Seq("a", "b", "c", "d")
  private val edgeList = Seq(("a", "b", 3L), ("b", "a", 1L),
    ("a", "c", 1L), ("c", "a", 2L))

  /** Sequential replay: same half-up integer divisions, same order of
    * operations per node (sum order is irrelevant in integer math).
    */
  private def replay(iters: Int): Map[String, Long] = {
    val n = nodeIds.size.toLong
    def halfUp(a: BigInt, b: BigInt): BigInt = (2 * a + b) / (2 * b)
    val wout = edgeList.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodeIds.map(_ -> halfUp(BigInt(1000000000L), n).toLong).toMap
    for (_ <- 1 to iters) {
      val contrib = edgeList
        .map { case (s, d, w) => d -> halfUp(BigInt(r(s)) * w, wout(s)).toLong }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      r = nodeIds.map { id =>
        id -> (halfUp(BigInt(150000000L), n).toLong +
          ((170L * contrib.getOrElse(id, 0L) + 100L) / 200L))
      }.toMap
    }
    r
  }

  test("distributed ranks are bit-exact with the sequential integer replay") {
    val nodes = nodeIds.toDF("id")
    val edges = edgeList.toDF("src", "dst", "w")
    for (iters <- Seq(1, 5)) {
      val got = PageRank.ranks(nodes, edges, iters).as[(String, Double)]
        .collect().toMap
      val want = replay(iters).map { case (k, v) => k -> v.toDouble / 1e9 }
      assert(got == want, s"iters=$iters: $got != $want")
    }
  }

  test("driver path == distributed path, bit-exact (r14 bounded-graph shortcut)") {
    val nodes = nodeIds.toDF("id")
    val edges = edgeList.toDF("src", "dst", "w")
    for (iters <- Seq(1, 5)) {
      val driver = PageRank.ranks(nodes, edges, iters)
        .as[(String, Double)].collect().toMap
      val dist = PageRank.ranks(nodes, edges, iters, driverEdgeThreshold = 0)
        .as[(String, Double)].collect().toMap
      assert(driver == dist, s"iters=$iters: $driver != $dist")
    }
  }

  test("driver gate respects node count: dangling-heavy graph stays distributed") {
    import spark.implicits._
    // 30 nodes, 1 edge: the edge probe alone would take the driver
    // path and collect ALL node ids; the r15 node-count gate must send
    // this to the distributed loop (threshold 5 < 30 nodes), and both
    // paths must stay bit-exact.
    val nodes = (1 to 30).map(i => s"n$i").toDF("id")
    val edges = Seq(("n1", "n2", 1L)).toDF("src", "dst", "w")
    val gated = PageRank.ranks(nodes, edges, 3, driverEdgeThreshold = 5)
      .as[(String, Double)].collect().toMap
    val driver = PageRank.ranks(nodes, edges, 3) // default threshold: driver path
      .as[(String, Double)].collect().toMap
    assert(gated.size === 30)
    assert(gated === driver)
  }

  test("ranks sum to just under 1.0 (dangling mass dropped, not redistributed)") {
    val nodes = nodeIds.toDF("id")
    val edges = edgeList.toDF("src", "dst", "w")
    val total = PageRank.ranks(nodes, edges, 10)
      .agg(sum(col("authority"))).head().getDouble(0)
    // d receives teleport-only mass it never passes on; with one
    // dangling node of four, the loss per iteration is bounded by
    // 0.85 * r(d), so the total stays in (0.5, 1.0]
    assert(total > 0.5 && total <= 1.0, s"total=$total")
  }

  test("iters bounds are enforced") {
    val nodes = nodeIds.toDF("id")
    val edges = edgeList.toDF("src", "dst", "w")
    intercept[IllegalArgumentException](PageRank.ranks(nodes, edges, 0))
    intercept[IllegalArgumentException](PageRank.ranks(nodes, edges, 51))
  }
}
