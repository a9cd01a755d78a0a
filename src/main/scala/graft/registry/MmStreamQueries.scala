package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.streaming.EventStreams

/** Multimodal-column plumbing + streaming-shape queries.
  *
  * `mm_metadata` / `mm_decode_stub` run the binary pipeline (metadata
  * in the scan; decode through the mapPartitions effect seam with the
  * deterministic stub) — both oracle-checked since the stub derives
  * from md5. `stream_tumbling_hourly` is the batch run of the exact
  * plan `EventStreams.tumblingCounts` executes on a stream (unified
  * engine); the streaming execution itself is covered by
  * EventStreamsSpec on MemoryStream.
  */
object MmStreamQueries extends QueryRegistry {

  /** Scale-adaptive divisor for the user-hash slice of `events` (the
    * stream_sessionize scale twin) — same SampleMod ladder as the
    * docs/emb slices, keyed on the EVENT count (users are uniform over
    * events in the fixture, so the sliced stream is ~TargetSlice rows).
    */
  private[registry] def userMod(s: SparkSession, dir: String): Long =
    SampleMod.of(Tables.events(s, dir).count(), 8)

  private def binDocs(s: SparkSession, dir: String): DataFrame = {
    val content = when(col("doc_id") % 4 === 0, lit("%PDF-1.7 stream"))
      .when(col("doc_id") % 4 === 1, lit("PK worddoc"))
      .otherwise(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), content.cast("binary").as("content"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata" -> ((s, dir) =>
      Multimodal.withMetadata(binDocs(s, dir), "content").drop("content")),

    "mm_decode_stub" -> ((s, dir) => {
      import s.implicits._
      Multimodal.decodeImages(
        binDocs(s, dir).as[Multimodal.BinDoc]).toDF()
    }),

    "mm_frame_sample" -> ((s, dir) => {
      import s.implicits._
      Multimodal.sampleFrames(
        Multimodal.decodeImages(binDocs(s, dir).as[Multimodal.BinDoc]).toDF(),
        stride = 5)
    }),

    // decode -> feature-extract -> similarity: the multimodal chain
    // ending in the same top-k operator text embeddings use.
    "mm_embed_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = Multimodal.embedStub(binDocs(s, dir).as[Multimodal.BinDoc])
        .toDF().withColumnRenamed("doc_id", "vec_id")
      graft.similarity.Knn.bruteForceTopK(
        emb.filter(col("vec_id") < 10), emb, k = 3)
    }),

    "stream_tumbling_hourly" -> ((s, dir) =>
      EventStreams.tumblingCounts(Tables.events(s, dir), "1 hour")),

    "stream_sessionize" -> ((s, dir) =>
      EventStreams.sessionCounts(Tables.events(s, dir), "30 minutes")),

    // the COMPLETE session_window chain over the deterministic
    // 1/userMod xxhash64 USER slice — the scale-record twin. Sessions
    // are per-user by construction, so slicing users before
    // sessionization equals slicing the full output: the twin grades
    // real session semantics while DuckDB replays only ~1/mod of the
    // event stream (the full lag+cumsum twin materializes a window
    // over every event — oracle-side intractable at the 100M replica).
    "stream_sessionize_sampled" -> ((s, dir) =>
      EventStreams.sessionCounts(
        Tables.events(s, dir)
          .filter(pmod(xxhash64(col("user_id")), lit(userMod(s, dir))) === 0),
        "30 minutes")),

    // S5's streaming corpus-ingest twin: batch form of the cross-batch
    // fingerprint dedup EventStreamsSpec drives on a MemoryStream
    // (originals arrive, then exact copies) — min-id survivor per
    // canonical content, which is exactly what first-arrival
    // dropDuplicates("fp") yields when copies arrive after originals.
    // The spec asserts stream output == this query on the same fixture.
    "stream_corpus_ingest" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val arriving = docs.unionByName(
        docs.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      arriving
        .withColumn("fp", graft.text.TextAnalysis.fingerprint(col("text")))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_seen"))
    }),

    // §2.7 watermark/late-data: a REAL append-mode stream runs inside
    // the query (MemoryStream, 3 micro-batches), so the engine's
    // watermark semantics — not a batch approximation — sit under the
    // DuckDB hash gate. Deterministic arrival simulation over `events`:
    // hour slot = event_id % 7, all event times at :20 and the
    // 90-minute watermark landing at :50, so no timestamp ever ties a
    // window or watermark boundary. Batch 1 carries 4-in-5 rows (slots
    // 0..6 → watermark 04:50 after it); batch 2 delivers the held-back
    // rows — slots 0..3 fall in closed windows and are DROPPED, slots
    // 4..6 still count; batch 3 is a single flush row at 09:20 that
    // closes windows 4..6 (its own window never emits). The oracle
    // recomputes exactly the surviving set.
    "stream_late_data" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      // The MemoryStream arrival simulation is driver-side by nature
      // (a test-harness shape, not a scale path); cap the fixture at
      // the base event range so replicated scale-up dirs don't balloon
      // the driver collect — the watermark semantics under test are
      // scale-independent.
      val arriving = Tables.events(s, dir)
        .filter(col("event_id") < 1000000L)
        .select(
          col("event_id"), col("event_type"), col("value"),
          (col("event_id") % 7).cast("int").as("slot"))
        .collect()
        .map(r => (r.getLong(0),
          java.sql.Timestamp.valueOf(f"2024-01-01 ${r.getInt(3)}%02d:20:00"),
          r.getString(1), r.getDouble(2)))
      val late = arriving.filter(_._1 % 5 == 3)
      val onTime = arriving.filter(_._1 % 5 != 3)
      val flush = (-1L, java.sql.Timestamp.valueOf("2024-01-01 09:20:00"), "flush", 0.0)
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, String, Double)]
      val name = "graft_late_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      val q = graft.streaming.EventStreams.tumblingCounts(
          mem.toDF().toDF("event_id", "ts", "event_type", "value"),
          "1 hour", "90 minutes")
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        mem.addData(onTime.toIndexedSeq: _*); q.processAllAvailable()
        mem.addData(late.toIndexedSeq: _*); q.processAllAvailable()
        mem.addData(flush); q.processAllAvailable()
      } finally q.stop()
      s.table(name)
    }),

    // §2.7 stream-stream join: view→click attribution as TWO real
    // MemoryStreams — all views in batch 1, all clicks in batch 2, so
    // every match crosses a micro-batch boundary through the join
    // state store. Inner-join semantics == the batch join, which is
    // the oracle.
    "stream_stream_attribution" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      def side(kind: String) = Tables.events(s, dir)
        .filter(col("event_id") < 1000000L && col("event_type") === kind)
        .select(col("event_id"), col("user_id"), col("ts")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
      val views = side("view")
      val clicks = side("click")
      val vMem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)]
      val cMem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)]
      val name = "graft_attr_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      val joined = graft.streaming.EventStreams.attributionJoin(
        vMem.toDF().toDF("view_id", "user_id", "view_ts"),
        cMem.toDF().toDF("click_id", "user_id", "click_ts"))
      val q = joined.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        vMem.addData(views.toIndexedSeq: _*); q.processAllAvailable()
        cMem.addData(clicks.toIndexedSeq: _*); q.processAllAvailable()
      } finally q.stop()
      s.table(name)
    }),

    // Streaming LSH near-dup admission as a REAL 2-batch stream: base
    // docs arrive first, near-dup copies (+100000, 3 appended tokens)
    // in the next micro-batch; per (band, bucket) state marks every
    // post-first arrival. The oracle replays the identical XXH64
    // banding chain and derives `first` from min doc_id per bucket —
    // valid because copies both id-sort and arrive after originals.
    "stream_lsh_neardup" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val base = Tables.documents(s, dir)
        .filter(col("doc_id") < 1000000L)
        .select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val copies = base.filter(_._1 % 7 == 0)
        .map { case (id, t) => (id + 100000L, t + " zz9 yy8 xx7") }
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val name = "graft_lshnd_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      val bands = graft.streaming.StreamingNearDup.bandRows(
          mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
        .as[graft.streaming.StreamingNearDup.BandRow]
      val q = graft.streaming.StreamingNearDup.admit(bands).toDF()
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        mem.addData(base.toIndexedSeq: _*); q.processAllAvailable()
        mem.addData(copies.toIndexedSeq: _*); q.processAllAvailable()
      } finally q.stop()
      s.table(name)
    }),
    // Streaming router against a FROZEN k-means index: centroids come
    // from the batch-trained Clustering artifact (k × dim doubles,
    // shipped as expression literals — the write-once index shape),
    // and each arriving vector is assigned by a per-row codegen
    // argmin — no shuffle, no state, so the plan streams in append
    // mode untouched. Routed output is bit-identical to the batch
    // assignment (same 6-dp dot-product chain), so the twin IS the
    // emb_kmeans_cluster SQL.
    "stream_cluster_route" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val emb = Tables.embeddings(s, dir)
      val cents = graft.similarity.Clustering.kmeansCentroids(emb, k = 8, iters = 2)
      // double-typed fixture: the stream must carry the EXACT values
      // the batch assignment and the DuckDB twin consume — a float
      // truncation here would diverge the routed dist2 under a
      // double-precision writer layout (float→double widens exactly,
      // so this collect is layout-safe in both directions)
      val rows = emb
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("embedding"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Array[Double])]
      val name = "graft_route_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      val routed = mem.toDF().toDF("vec_id", "embedding")
        .withColumn("r",
          graft.similarity.Clustering.routeToCentroids(cents, col("embedding")))
        .select(col("vec_id"), col("r").getField("cid").as("cluster"),
          col("r").getField("d2").as("dist2"))
      val q = routed.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        val (b1, b2) = rows.partition(_._1 % 2 == 0)
        mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
        mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      } finally q.stop()
      s.table(name)
    }),
  )

  private val contentSql =
    """CASE doc_id % 4 WHEN 0 THEN '%PDF-1.7 stream'
      |  WHEN 1 THEN 'PK worddoc' ELSE text END""".stripMargin.replace("\n", " ")

  def oracle: Map[String, String] = Map(
    // routed == batch assignment by construction (same literal math)
    "stream_cluster_route" -> s"""
      |WITH ${SimilarityQueries.kmeansCtes(8, 2)}
      |SELECT vec_id, cid AS cluster, d2 AS dist2 FROM af""".stripMargin,

    "mm_metadata" -> s"""
      |SELECT doc_id,
      |  octet_length(encode($contentSql)) AS size_bytes,
      |  CASE WHEN left($contentSql, 4) = '%PDF' THEN 'pdf'
      |       WHEN left($contentSql, 2) = 'PK' THEN 'docx'
      |       ELSE 'bin' END AS file_type,
      |  md5($contentSql) AS content_md5
      |FROM documents""".stripMargin,

    "mm_decode_stub" -> s"""
      |WITH h AS (SELECT doc_id, md5($contentSql) AS hx FROM documents)
      |SELECT doc_id,
      |  32 * (1 + ascii(substr(hx, 1, 1)) % 8) AS width,
      |  32 * (1 + ascii(substr(hx, 2, 1)) % 8) AS height,
      |  1 + ascii(substr(hx, 3, 1)) % 4 AS channels,
      |  1 + ascii(substr(hx, 4, 1)) % 30 AS n_frames
      |FROM h""".stripMargin,

    "mm_frame_sample" -> s"""
      |WITH h AS (SELECT doc_id, 1 + ascii(substr(md5($contentSql), 4, 1)) % 30 AS n_frames
      |           FROM documents)
      |SELECT doc_id, unnest(generate_series(0, n_frames - 1, 5)) AS frame_idx
      |FROM h""".stripMargin,

    "mm_embed_topk" -> s"""
      |WITH h AS (SELECT doc_id AS vec_id, md5($contentSql) AS hx FROM documents),
      |v AS (SELECT vec_id,
      |        list_transform(generate_series(1, 8),
      |          i -> (ascii(substr(hx, i, 1)) % 16) / 15.0 - 0.5) AS e
      |      FROM h),
      |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
      |scored AS (
      |  SELECT query_id, v.vec_id AS cand_id,
      |    round(list_sum(list_transform(list_zip(qe, v.e), x -> x[1] * x[2])) /
      |      (sqrt(list_sum(list_transform(list_zip(qe, qe), x -> x[1] * x[2]))) *
      |       sqrt(list_sum(list_transform(list_zip(v.e, v.e), x -> x[1] * x[2])))), 6) AS sim
      |  FROM v, q WHERE query_id <> v.vec_id),
      |r AS (SELECT *, row_number() OVER (
      |        PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank
      |      FROM scored)
      |SELECT query_id, cand_id, sim, rank FROM r WHERE rank <= 3""".stripMargin,

    "stream_corpus_ingest" -> """
      |WITH arriving AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0)
      |SELECT md5(array_to_string(string_split_regex(lower(trim(text)), '\s+'), ' ')) AS fp,
      |  MIN(doc_id) AS doc_id, COUNT(*) AS n_seen
      |FROM arriving GROUP BY 1""".stripMargin,

    "stream_tumbling_hourly" -> """
      |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin,

    // survivors of the watermark drop: on-time rows everywhere, late
    // rows only where their window was still open (slot >= 4).
    "stream_late_data" -> """
      |WITH e AS (
      |  SELECT event_id, event_type, value, event_id % 7 AS slot FROM events
      |  WHERE event_id < 1000000),
      |kept AS (
      |  SELECT * FROM e WHERE event_id % 5 <> 3 OR slot >= 4)
      |SELECT strftime(TIMESTAMP '2024-01-01 00:00:00' + slot * INTERVAL 1 HOUR,
      |    '%Y-%m-%d %H:%M') AS window_start,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM kept GROUP BY 1, 2""".stripMargin,

    "stream_stream_attribution" -> """
      |SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id
      |FROM events v JOIN events c
      |  ON v.user_id = c.user_id
      | AND v.event_type = 'view' AND c.event_type = 'click'
      | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
      |WHERE v.event_id < 1000000 AND c.event_id < 1000000""".stripMargin,

    // identical XXH64 banding chain as dedup_minhash's oracle; `first`
    // from min doc_id per bucket (arrival order == id order here).
    "stream_lsh_neardup" -> s"""
      |WITH RECURSIVE docs AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 1000000
      |  UNION ALL
      |  SELECT doc_id + 100000, text || ' zz9 yy8 xx7' FROM documents
      |  WHERE doc_id % 7 = 0 AND doc_id < 1000000),
      |${ScaleDedupQueries.minhashBandedCtes}
      |SELECT b.id AS doc_id, b.band, b.bh AS band_hash,
      |  (b.id = MIN(b.id) OVER (PARTITION BY b.band, b.bh)) AS first
      |FROM banded b""".stripMargin,

    // lag + cumulative-sum sessionization is the closed-form equivalent
    // of session_window: new session iff gap >= 30 min (micros).
    "stream_sessionize" ->
      s"WITH ${sessionizeChain("SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events")}",

    // the same closed form over the 1/userMod XXH64 user slice — the
    // scale-record twin (per-user independence makes input slicing
    // exact, see the Spark-side comment).
    "stream_sessionize_sampled" -> s"""
      |WITH RECURSIVE ${SampleMod.modCte("events", 8)},
      |${XxHashOracleSql.longHashCte("usel", "events",
           Seq("user_id", "event_id", "value", "ts"), "user_id",
           "CAST(42 AS UBIGINT)", "h64")},
      |${sessionizeChain(
           "SELECT user_id, event_id, value, epoch_us(ts) AS us FROM usel " +
             s"WHERE ${SampleMod.slicePredicate("h64")}")}""".stripMargin,
  )

  /** The lag + cumsum sessionization chain over an arbitrary
    * `(user_id, event_id, value, us)` source SELECT — shared by the
    * full twin and the user-slice scale twin.
    */
  private def sessionizeChain(eventsSrc: String): String = s"""
    |e AS ($eventsSrc),
    |m AS (
    |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
    |      OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
    |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    |s AS (
    |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
    |    ROWS UNBOUNDED PRECEDING) AS sid
    |  FROM m)
    |SELECT user_id,
    |  strftime(make_timestamp(MIN(us)), '%Y-%m-%d %H:%M:%S') AS session_start,
    |  COUNT(*) AS n_events,
    |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    |FROM s GROUP BY user_id, sid""".stripMargin
}
