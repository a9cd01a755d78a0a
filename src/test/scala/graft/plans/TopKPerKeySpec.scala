package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The native partial/final top-k operator must agree with the window
  * row_number form on every input, while the plan shows the bounded
  * map-side stage (the point of the operator).
  */
class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(spark, TestSpark.SfDir)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("o_custkey", "o_orderkey", "rank")
  }

  private def nativeTopK(k: Int) =
    TopK.perKey(Tables.orders(spark, TestSpark.SfDir),
      Seq(col("o_custkey")),
      Seq(col("o_orderdate").desc, col("o_orderkey").desc), k)
      .select("o_custkey", "o_orderkey", "rank")

  test("native top-k equals window row_number for k=1 and k=3") {
    for (k <- Seq(1, 3)) {
      val expected = windowTopK(k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val got = nativeTopK(k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === expected, s"k=$k")
    }
  }

  test("plan contains the partial (map-side) and final stages with an exchange between") {
    val plan = nativeTopK(2).queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopK"), plan)
    assert(plan.contains("FinalTopK"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    // the full-sort window machinery must be absent
    assert(!plan.contains("Window"), plan)
  }

  test("null keys group together; ties break by the order columns only") {
    val df = Seq(
      (Some(1L), 10L, "2024-01-01"), (Some(1L), 11L, "2024-01-02"),
      (None, 20L, "2024-03-01"), (None, 21L, "2024-02-01"),
      (Some(2L), 30L, "2024-05-05"))
      .toDF("k", "id", "d")
    val got = TopK.perKey(df, Seq(col("k")), Seq(col("d").desc, col("id").desc), 1)
      .select("k", "id", "rank").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 11L, -1L -> 20L, 2L -> 30L))
  }

  test("flush guard: key cardinality far above the buffer cap still matches the window form") {
    // orders has ~1500 distinct custkeys per partition-set at sf0.001;
    // cap the partial map at 16 keys so every partition flushes dozens
    // of times — the emit-and-reset path must be invisible in the result.
    spark.conf.set(PartialTopKExec.MaxBufferedKeysConf, "16")
    try {
      for (k <- Seq(1, 3)) {
        val expected = windowTopK(k).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val got = nativeTopK(k).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(got === expected, s"k=$k under flush pressure")
      }
    } finally spark.conf.unset(PartialTopKExec.MaxBufferedKeysConf)
  }

  test("k larger than group size returns whole groups ranked") {
    val df = Seq((1L, 1L), (1L, 2L), (2L, 5L)).toDF("k", "v")
    val got = TopK.perKey(df, Seq(col("k")), Seq(col("v").asc), 10)
      .select("k", "v", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 1L, 1), (1L, 2L, 2), (2L, 5L, 1)))
  }
}
