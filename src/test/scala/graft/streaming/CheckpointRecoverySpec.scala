package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Checkpoint recovery across a REAL stop/restart: a watermarked
  * windowed aggregation (append mode, file sink) is stopped
  * mid-stream — open window state and the current watermark live only
  * in the checkpoint — then restarted. The restarted run must:
  *
  *  1. merge new in-watermark events into the RECOVERED window state
  *     (the emitted count spans the restart — state-store recovery);
  *  2. drop an event behind the RECOVERED watermark (a fresh query
  *     would have accepted it — watermark recovery);
  *  3. emit each closed window exactly once, and a third restart with
  *     no new input must add nothing (exactly-once across restarts,
  *     via the sink's commit log).
  *
  * maxFilesPerTrigger=1 forces one micro-batch per input file, making
  * the watermark advance deterministic (append mode emits a window in
  * the batch AFTER the watermark passes its end).
  */
class CheckpointRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("windowed agg recovers state+watermark from checkpoint, emits exactly once") {
    val inDir = Files.createTempDirectory("ckpt-in").toString
    val ckpt = Files.createTempDirectory("ckpt-state").toString
    val outDir = Files.createTempDirectory("ckpt-out").toString

    def addFile(times: String*): Unit =
      times.toSeq.toDF("event_time")
        .select(col("event_time").cast("timestamp"), lit("e").as("k"))
        .repartition(1).write.mode("append").json(inDir)

    def drain(): Unit = {
      val in = spark.readStream
        .schema("event_time TIMESTAMP, k STRING")
        .option("maxFilesPerTrigger", 1)
        .json(inDir)
      val agg = in.withWatermark("event_time", "10 minutes")
        .groupBy(window(col("event_time"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("n"))
      val q = agg.writeStream.outputMode("append")
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    def sink(): Seq[(String, Long)] =
      try spark.read.parquet(outDir)
        .select(date_format(col("w_start"), "HH:mm").as("w"), col("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
      catch { case _: Throwable => Seq.empty } // no files committed yet

    // ---- run 1: three events fill the 10:00 window; watermark ends at
    // 10:40 < 11:00, so the window is OPEN when the query stops.
    addFile("2026-01-01 10:05:00")
    addFile("2026-01-01 10:20:00")
    addFile("2026-01-01 10:50:00")
    drain()
    assert(sink().isEmpty, "open window must not emit before its watermark")

    // ---- run 2 (restart from checkpoint): one file with a late-but-
    // live event (10:55 — its window is open, merges into recovered
    // state) AND an expired-window event (09:30: window [09:00,10:00)
    // ends before the RECOVERED watermark 10:40 → dropped; a query
    // that lost the watermark would keep it and later emit a spurious
    // 09:00 row); then two files that push the watermark past 11:00
    // over two batches.
    addFile("2026-01-01 10:55:00", "2026-01-01 09:30:00")
    addFile("2026-01-01 12:00:00")
    addFile("2026-01-01 12:05:00")
    drain()
    assert(sink() === Seq("10:00" -> 4L),
      "closed window must emit once, state merged across the restart, " +
        "expired-window event dropped by the recovered watermark")

    // ---- run 3 (restart again, no new input): nothing may re-emit.
    drain()
    assert(sink() === Seq("10:00" -> 4L), "restart with no input re-emitted rows")
  }
}
