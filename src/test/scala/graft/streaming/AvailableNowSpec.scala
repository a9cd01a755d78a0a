package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The reference's scheduler re-runs (§2.7) as a Structured Streaming
  * file source with Trigger.AvailableNow: each tick drains whatever
  * landed since the last run, then stops — incremental batch with
  * engine-managed progress tracking, plus approx-distinct tolerance.
  */
class AvailableNowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AvailableNow drains new files per tick and tracks progress") {
    val inDir = Files.createTempDirectory("stream-in").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString

    def runTick(): Long = {
      val stream = spark.readStream
        .schema("event_id LONG, event_type STRING, value DOUBLE")
        .json(inDir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      val q = stream.writeStream
        .outputMode("complete")
        .format("memory").queryName("tick_out")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table("tick_out").agg(sum(col("n"))).collect()(0).getLong(0)
    }

    Seq((1L, "click", 1.0), (2L, "view", 2.0)).toDF("event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    assert(runTick() === 2)

    // second batch of files lands; next tick processes the union state
    Seq((3L, "click", 3.0)).toDF("event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    assert(runTick() === 3)
  }

  test("approx_count_distinct stays within its error bound") {
    val exact = graft.Tables.lineitem(spark, TestSpark.SfDir)
      .select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    val approx = graft.Tables.lineitem(spark, TestSpark.SfDir)
      .select(approx_count_distinct(col("l_partkey"), 0.02)).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile tracks exact percentiles within 2%") {
    val li = graft.Tables.lineitem(spark, TestSpark.SfDir)
    val rows = li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact_med"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_med"),
      expr("percentile(l_extendedprice, 0.9)").as("exact_p90"),
      expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("approx_p90"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(1)) / r.getDouble(1) < 0.02, r)
      assert(math.abs(r.getDouble(4) - r.getDouble(3)) / r.getDouble(3) < 0.02, r)
    }
  }
}
