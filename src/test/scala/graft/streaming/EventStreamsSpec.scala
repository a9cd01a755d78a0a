package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming shapes actually executed as streams: MemoryStream drives
  * the same plan the registry runs in batch; results must agree.
  */
class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (1L, ts("2024-01-01 10:05:00"), "click", 1.0),
    (2L, ts("2024-01-01 10:55:00"), "click", 2.0),
    (3L, ts("2024-01-01 11:05:00"), "view", 3.0),
    (2L, ts("2024-01-01 10:55:00"), "click", 2.0), // duplicate event_id
    (4L, ts("2024-01-01 12:30:00"), "click", 4.0))

  test("tumbling window counts on a real stream match the batch plan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val input = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.tumblingCounts(input, "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("tumbling_out")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    q.stop()

    val batch = EventStreams.tumblingCounts(
      rows.toDF("event_id", "ts", "event_type", "value"), "1 hour")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    assert(streamed === batch)
    assert(streamed(("2024-01-01 10:00", "click")) === ((3L, 5.0)))
  }

  test("flatMapGroupsWithState keeps per-user totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val input = mem.toDF().toDF("user_id", "ts", "value")
      .as[EventStreams.UserEvent]
    val q = EventStreams.runningTotals(input, alertAt = 5.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("totals_out").start()
    mem.addData((1L, ts("2024-01-01 10:00:00"), 2.0), (1L, ts("2024-01-01 10:01:00"), 2.0))
    q.processAllAvailable()
    mem.addData((1L, ts("2024-01-01 10:02:00"), 2.0)) // second micro-batch
    q.processAllAvailable()
    val rows = spark.table("totals_out").orderBy("n").collect()
      .map(r => (r.getDouble(1), r.getLong(2), r.getBoolean(3)))
    q.stop()
    // state carried over: third event sees total 6.0 and alerts
    assert(rows.toSeq === Seq((2.0, 1L, false), (4.0, 2L, false), (6.0, 3L, true)))
  }

  test("streaming corpus ingest dedups on content fingerprint across micro-batches") {
    // the training-ingest shape: documents arrive as a stream, exact
    // dedup keys on the content fingerprint (whitespace/case-canonical
    // md5), and the dedup state survives micro-batch boundaries.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val input = mem.toDF().toDF("doc_id", "ts", "text")
      .withColumn("fp", graft.text.TextAnalysis.fingerprint(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("fp")
    val q = input.writeStream.outputMode("append")
      .format("memory").queryName("corpus_dedup_out").start()
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), "the quick brown fox"),
      (2L, ts("2024-01-01 10:00:30"), "THE  quick   Brown fox"), // same canonical
      (3L, ts("2024-01-01 10:01:00"), "something else"))
    q.processAllAvailable()
    mem.addData(
      (4L, ts("2024-01-01 10:02:00"), "the quick brown fox"), // dup from batch 1
      (5L, ts("2024-01-01 10:03:00"), "genuinely new text"))
    q.processAllAvailable()
    val out = spark.table("corpus_dedup_out").collect().map(_.getLong(0)).sorted
    q.stop()
    // one survivor per canonical content, across batches
    assert(out.length === 3)
    assert(out.contains(3L) && out.contains(5L))
    assert(out.count(id => Seq(1L, 2L, 4L).contains(id)) === 1)
  }

  test("streaming corpus ingest equals the registered batch twin on real documents") {
    // same fixture as the registered stream_corpus_ingest query:
    // originals arrive in batch 1, exact copies (+100000) in batch 2 —
    // first-arrival dropDuplicates must keep exactly the batch twin's
    // min-id survivors.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = graft.TestSpark.SfDir
    // The fixture itself contains exact-duplicate text groups; streaming
    // dropDuplicates keeps an arbitrary first-arrival row while the
    // batch twin keeps min(doc_id). Pre-dedup batch-1 input to one doc
    // per fingerprint (min doc_id) so arrival order can't disagree.
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .withColumn("fp", graft.text.TextAnalysis.fingerprint(col("text")))
      .groupBy(col("fp"))
      .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("r"))
      .select(col("r.doc_id"), col("r.text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val copies = docs.filter(_._1 % 3 == 0).map { case (id, t) => (id + 100000, t) }
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .withColumn("fp", graft.text.TextAnalysis.fingerprint(col("text")))
      .dropDuplicates("fp")
      .writeStream.outputMode("append")
      .format("memory").queryName("ingest_parity_out").start()
    mem.addData(docs.toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(copies.toIndexedSeq: _*)
    q.processAllAvailable()
    val streamed = spark.table("ingest_parity_out")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    q.stop()
    val batch = graft.registry.MmStreamQueries.queries("stream_corpus_ingest")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(streamed === batch)
  }

  test("stream-static broadcast enrichment join matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = graft.TestSpark.SfDir
    val dim = graft.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    val evRows = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("user_id", "value")
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.OracleSafe.decSum(col("value")).as("total_value"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("enrich_join_out").start()
    mem.addData(evRows.toIndexedSeq: _*)
    q.processAllAvailable()
    val streamed = spark.table("enrich_join_out").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    q.stop()
    val batch = graft.registry.AggQueries.queries("stream_enrich_join")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(streamed === batch)
  }

  test("append-mode watermark drops a late row into a closed window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val input = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.tumblingCounts(input, "1 hour", "90 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("late_drop_out").start()
    // batch 1: row in [10,11) + watermark driver at 13:20 → W = 11:50
    mem.addData(
      (1L, ts("2024-01-01 10:20:00"), "click", 1.0),
      (2L, ts("2024-01-01 13:20:00"), "click", 1.0))
    q.processAllAvailable()
    // batch 2: LATE row into [10,11) (end 11:00 < W → closed, dropped);
    // row into [12,13) (end 13:00 > W → open, kept)
    mem.addData(
      (3L, ts("2024-01-01 10:25:00"), "click", 1.0),
      (4L, ts("2024-01-01 12:20:00"), "view", 1.0))
    q.processAllAvailable()
    // batch 3: flush at 16:20 → W = 14:50 closes [12,13) and [13,14)
    mem.addData((5L, ts("2024-01-01 16:20:00"), "flush", 0.0))
    q.processAllAvailable()
    val streamed = spark.table("late_drop_out").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    q.stop()
    // the late row did NOT increment its closed window...
    assert(streamed(("2024-01-01 10:00", "click")) === 1L)
    assert(streamed(("2024-01-01 12:00", "view")) === 1L)
    assert(streamed(("2024-01-01 13:00", "click")) === 1L)
    // ...whereas the same plan on batch counts it — the difference IS
    // the watermark semantics, proven not assumed.
    val batch = EventStreams.tumblingCounts(
      Seq(
        (1L, ts("2024-01-01 10:20:00"), "click", 1.0),
        (2L, ts("2024-01-01 13:20:00"), "click", 1.0),
        (3L, ts("2024-01-01 10:25:00"), "click", 1.0),
        (4L, ts("2024-01-01 12:20:00"), "view", 1.0))
        .toDF("event_id", "ts", "event_type", "value"), "1 hour", "90 minutes")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(batch(("2024-01-01 10:00", "click")) === 2L)
  }

  test("stream-stream interval join matches across micro-batches and equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")),
      (11L, 2L, ts("2024-01-01 10:00:00")),
      (12L, 1L, ts("2024-01-01 12:00:00")))
    val clicks = Seq(
      (20L, 1L, ts("2024-01-01 10:30:00")), // within 1h of view 10
      (21L, 2L, ts("2024-01-01 11:30:00")), // > 1h after view 11 — no match
      (22L, 1L, ts("2024-01-01 12:10:00"))) // within 1h of view 12 only
    val vMem = MemoryStream[(Long, Long, Timestamp)]
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStreams.attributionJoin(
        vMem.toDF().toDF("view_id", "user_id", "view_ts"),
        cMem.toDF().toDF("click_id", "user_id", "click_ts"))
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    vMem.addData(views: _*); q.processAllAvailable()
    cMem.addData(clicks: _*); q.processAllAvailable() // matches cross batches
    val streamed = spark.table("attr_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(streamed === Set((10L, 20L), (12L, 22L)))

    val batch = EventStreams.attributionJoin(
        views.toDF("view_id", "user_id", "view_ts"),
        clicks.toDF("click_id", "user_id", "click_ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
  }

  test("left-outer stream-stream join emits unmatched views after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[(Long, Long, Timestamp)]
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStreams.attributionJoinLeftOuter(
        vMem.toDF().toDF("view_id", "user_id", "view_ts"),
        cMem.toDF().toDF("click_id", "user_id", "click_ts"))
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_outer_out").start()
    vMem.addData(
      (10L, 1L, ts("2024-01-01 10:00:00")),   // will match
      (11L, 2L, ts("2024-01-01 10:00:00")))   // never matches
    cMem.addData((20L, 1L, ts("2024-01-01 10:30:00")))
    q.processAllAvailable()
    // advance both watermarks far past view 11's join window
    // (10:00 + 1h window + 2h delay = 13:00); the unmatched view can
    // then be proven matchless, evicted, and emitted with null click
    vMem.addData((12L, 9L, ts("2024-01-01 18:00:00")))
    cMem.addData((21L, 9L, ts("2024-01-01 18:00:01")))
    q.processAllAvailable()
    q.processAllAvailable() // outer results emit a micro-batch later
    val out = spark.table("attr_outer_out").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    q.stop()
    assert(out.contains((10L, 20L)), s"matched row missing: $out")
    assert(out.contains((11L, -1L)), s"unmatched view not emitted: $out")
  }

  test("streaming dedup drops the duplicate event_id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val input = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.streamingDedup(input)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val out = spark.table("dedup_out").collect()
    q.stop()
    assert(out.length === 4)
    assert(out.map(_.getLong(0)).sorted === Array(1L, 2L, 3L, 4L))
  }

  test("dedup-within-watermark drops near-in-time duplicates and bounds state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val input = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.streamingDedupTtl(input, "event_id", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_ttl_out").start()
    // batch 1: original + a retry 2 min later (same id, inside the TTL)
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), "click", 1.0),
      (1L, ts("2024-01-01 10:02:00"), "click", 1.0),
      (2L, ts("2024-01-01 10:05:00"), "view", 2.0))
    q.processAllAvailable()
    // batch 2: a cross-micro-batch retry, still within the watermark
    mem.addData((2L, ts("2024-01-01 10:06:00"), "view", 2.0),
      (3L, ts("2024-01-01 10:07:00"), "click", 3.0))
    q.processAllAvailable()
    val out = spark.table("dedup_ttl_out").collect()
    q.stop()
    assert(out.map(_.getLong(0)).sorted === Array(1L, 2L, 3L))
    // the plan must dedupe WithinWatermark (state evicted as the
    // watermark passes), not the keep-state-forever dropDuplicates
    val plan = EventStreams.streamingDedupTtl(input, "event_id", "10 minutes")
      .queryExecution.analyzed.toString
    assert(plan.contains("DeduplicateWithinWatermark"), plan)
  }
}
