package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The big-state backend proof: every stateful operator in this repo
  * defaults to the HDFS-backed state store, which holds the full state
  * map on-heap per partition — at 100 TB-pipeline state sizes
  * (billions of dedup keys) that OOMs, and the production answer is
  * the RocksDB provider (off-heap, spillable, incremental-checkpoint).
  * This spec runs REAL multi-batch streams — watermarked dedup and a
  * tumbling aggregation — under
  * `spark.sql.streaming.stateStore.providerClass = RocksDBStateStore
  * Provider` and asserts bit-identical results vs the default
  * provider: the operators' state semantics are backend-independent,
  * so flipping the conf is the whole migration.
  */
class RocksDbStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (1L, ts("2024-01-01 10:05:00"), "click", 1.0),
    (2L, ts("2024-01-01 10:55:00"), "click", 2.0),
    (3L, ts("2024-01-01 11:05:00"), "view", 3.0),
    (2L, ts("2024-01-01 10:55:00"), "click", 2.0), // duplicate event_id
    (4L, ts("2024-01-01 12:30:00"), "click", 4.0))

  private def runBoth(name: String)
      (query: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : (Seq[String], Seq[String]) = {
    def run(s2: org.apache.spark.sql.SparkSession, tag: String): Seq[String] = {
      import s2.implicits._
      implicit val sqlCtx = s2.sqlContext
      val mem = MemoryStream[(Long, Timestamp, String, Double)]
      val q = query(mem.toDF().toDF("event_id", "ts", "event_type", "value"))
        .writeStream.outputMode("append")
        .format("memory").queryName(s"${name}_$tag").start()
      // two micro-batches so state genuinely persists between batches
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val out = s2.table(s"${name}_$tag").collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
      q.stop()
      out
    }
    val default = spark.newSession()
    val rocks = spark.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    (run(default, "default"), run(rocks, "rocks"))
  }

  test("watermarked streaming dedup is identical under the RocksDB state store") {
    val (d, r) = runBoth("dedup")(df =>
      EventStreams.streamingDedup(df, watermarkDelay = "10 minutes"))
    assert(d.nonEmpty && d === r)
    assert(d.size === 4, s"dedup must drop the duplicate event: $d")
  }

  test("watermarked tumbling aggregation is identical under the RocksDB state store") {
    val (d, r) = runBoth("tumbling")(df =>
      df.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("w"),
          col("event_type"), col("n"), col("v")))
    assert(d === r)
  }
}
