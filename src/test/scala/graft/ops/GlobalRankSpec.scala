package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.GlobalRank

/** GlobalRank must agree bit-for-bit with the single-partition window
  * forms it replaces, while its plan never funnels the data through
  * one task — and its NTILE bucket-boundary arithmetic must replay
  * SQL NTILE (first n mod k buckets one larger) exactly, including
  * the n < k and n % k == 0 edges.
  */
class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def orders = Tables.orders(spark, TestSpark.SfDir)
    .select(col("o_orderkey"), col("o_totalprice"))

  test("withRowNumber equals the global window row_number") {
    val order = Seq(col("o_totalprice"), col("o_orderkey"))
    val expected = orders
      .withColumn("rn", row_number().over(Window.orderBy(order: _*)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = GlobalRank.withRowNumber(orders, order, "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("withNtile equals the global window ntile for several k") {
    val order = Seq(col("o_totalprice"), col("o_orderkey"))
    for (k <- Seq(1, 7, 8, 32)) {
      val expected = orders
        .withColumn("b", ntile(k).over(Window.orderBy(order: _*)))
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      val got = GlobalRank.withNtile(orders, order, k, "b")
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(got === expected, s"k=$k")
    }
  }

  test("ntile edges: n smaller than k, and n divisible by k") {
    val small = Seq(5L, 1L, 3L, 2L, 4L).toDF("id") // n=5
    for ((k, sizes) <- Seq(
        8 -> Seq(1, 1, 1, 1, 1),      // n < k: 5 singleton buckets
        5 -> Seq(1, 1, 1, 1, 1),      // n == k
        2 -> Seq(3, 2))) {            // remainder to the front
      val got = GlobalRank.withNtile(small, Seq(col("id")), k, "b")
        .groupBy("b").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val expected = sizes.zipWithIndex
        .map { case (s, i) => (i + 1) -> s.toLong }.toMap
      assert(got === expected, s"k=$k")
    }
  }

  test("the broadcast-offset path (many partitions) equals the CASE path") {
    val order = Seq(col("o_totalprice"), col("o_orderkey"))
    val few = GlobalRank.withRowNumber(orders, order, "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val many = GlobalRank.withRowNumber(orders, order, "rn", numPartitions = 300)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(many === few)
  }

  test("the plan has no single-partition exchange") {
    val plan = GlobalRank.withRowNumber(
      orders, Seq(col("o_totalprice"), col("o_orderkey")), "rn")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange leaked into:\n$plan")
  }
}
