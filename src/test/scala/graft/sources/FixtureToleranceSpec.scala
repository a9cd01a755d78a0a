package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Schema-on-read tolerance for driver-regenerated fixtures.
  *
  * The round-6 driver regeneration rewrote `events.parquet` from
  * TIMESTAMP(NANOS) to plain micros with no UTC flag — Spark 4 reads
  * that as TIMESTAMP_NTZ and every `unix_micros(ts)` call site failed
  * analysis, silently dropping 5 registered queries from the
  * correctness record. This spec round-trips the events table through
  * all three writer layouts a fixture generation has actually shipped
  * (tz-micros, plain-micros/NTZ, nanos-as-long) and asserts that
  * `Tables.events` normalizes each to a plain TIMESTAMP with identical
  * values, and that the event-family queries still analyze. The
  * reference's reads are similarly writer-tolerant (fetch.py:90-98
  * coerces on read rather than trusting the writer's schema).
  */
class FixtureToleranceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Canonical events rows from the committed fixture (whatever layout
    * the driver shipped this round), as (event_id, micros) pairs.
    */
  private lazy val canonical: Seq[(Long, Long)] =
    Tables.events(spark, TestSpark.SfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").limit(200)
      .as[(Long, Long)].collect().toSeq

  /** Rewrite the fixture's events into `layout` under a temp dir and
    * return that dir (shaped like an sfDir: contains events.parquet).
    */
  private def writeLayout(layout: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-fixture-$layout").toString
    val base = Tables.events(spark, TestSpark.SfDir)
    val out = layout match {
      case "tz-micros"  => base // session TZ is UTC; Spark writes isAdjustedToUTC micros
      case "ntz-micros" => base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      case "nanos-long" => base.withColumn("ts", unix_micros(col("ts")) * 1000L)
    }
    out.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  for (layout <- Seq("tz-micros", "ntz-micros", "nanos-long")) {
    test(s"Tables.events normalizes the $layout layout to TIMESTAMP with identical values") {
      val dir = writeLayout(layout)
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType === TimestampType,
        s"$layout: expected TimestampType, got ${df.schema("ts").dataType}")
      val got = df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").limit(200)
        .as[(Long, Long)].collect().toSeq
      assert(got === canonical, s"$layout: values drifted from canonical read")
    }

    test(s"event-family queries analyze against the $layout layout") {
      val dir = writeLayout(layout)
      // The 4 batch queries that died on the round-6 NTZ drift — all
      // read only the events table, so the layout dir suffices.
      for (q <- Seq("w5_latest_run", "events_gap_stats", "asof_join", "range_join")) {
        val df = graft.SparkEntry.queries(q)(spark, dir)
        df.queryExecution.assertAnalyzed()
      }
    }
  }
}
