package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round benchmark: headline queries at SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout.
  *
  * Queries are materialized with a noop write (not `.count()`, which
  * would let Catalyst prune the computed columns and time a skeleton of
  * the plan). The headline set spans the engine's cost centers: scan+agg
  * (q1), broadcast star join, window, the full IPES pipeline (including
  * the iterative dedup), the inverted-index and LSH dedup paths, vector
  * search, text scoring, and the event-time window.
  *
  * Noise protocol — the box is co-tenant-noisy (recorded rounds have
  * disagreed with isolated re-runs by 10–60×), so the bench defends
  * itself in three layers:
  *  1. START GATE: if the 1-min loadavg exceeds SPARK_GRAFT_LOAD_GATE
  *     (default 2.0) the bench WAITS for a quiet box, up to
  *     SPARK_GRAFT_GATE_WAIT_SEC (default 600 s), recording the wait.
  *  2. TRIALS + RECOVERY: every query runs ≥3 trials; a query whose
  *     median/min spread still exceeds 1.5× gets up to 2 bounded
  *     recovery re-trials. If the flag persists, its HEADLINE number
  *     becomes the MIN (ambient load only ever adds time, so min is
  *     the best estimate of the code's cost) — a usable number ships
  *     instead of a correctly-flagged useless median.
  *  3. SELF-REPORTING: `/proc/loadavg` at start/end, per-query spread
  *     flags (worst 5 on stdout, all in the file artifact), and a
  *     top-level `rejected: true` when >1/3 of queries stay flagged
  *     after recovery.
  *
  * Artifact contract (the round-5 lesson: the single stdout line
  * outgrew the driver's ~2 KB stdout-tail capture and recorded
  * `parsed: null`): stdout carries one COMPACT line — 2-decimal
  * medians-or-mins, min values only for flagged queries, worst-5
  * noise flags — kept under ~1.6 KB, while the FULL artifact
  * (3-decimal per-trial times, every min, every spread, gate wait)
  * is written to `bench/BENCH_local.json` in the repo so nothing is
  * lost.
  *
  * Harness contract: the metrics JSON is the ONLY line this main prints
  * to stdout (Spark logs go to stderr; build.sbt routes forked stdout
  * through unprefixed). A failed headline query is recorded in the
  * "errors" field and flips the exit code to 1 — never silently timed
  * as if it ran.
  */
object Bench {

  private val Headline = Seq(
    "q1_agg",
    "j1_star_join",
    "a11_monthly_trend",
    "w1_latest_per_group",
    "w1_latest_native",
    "ipes_companies_full",
    "dedup_ngram_jaccard_capped",
    "dedup_corpus_composed",
    "corpus_prep",
    "dedup_minhash",
    "emb_cosine_topk",
    "emb_near_dup",
    "emb_semantic_dedup",
    "text_quality",
    "stream_tumbling_hourly",
    "corpus_pack_sharded",
    "corpus_decontaminate",
    "merge_upsert",
    "dedup_segments",
    "dedup_containment",
    "source_overlap",
    "corpus_curriculum",
    "corpus_substring_spans",
    "corpus_scrub_spans",
    "corpus_scrub_repeats")

  /** The 10× scaling checkpoint: a subset chosen to answer the
    * empirical questions a 100 TB plan review asks — where the
    * composed LSH dedup crosses over the capped exact-Jaccard form,
    * how the native top-k gap vs the window form grows with data, and
    * (new in r5) the 10× curve of the heavy operators that had no
    * recorded ratio: the source-overlap matrix, segment dedup, the
    * exact-NTILE curriculum, the full IPES pipeline, and the PQ
    * vector-index family.
    */
  private val Sf1Headline = Seq(
    "q1_agg", "w1_latest_per_group", "w1_latest_native",
    "dedup_ngram_jaccard_capped", "dedup_corpus_composed", "corpus_prep",
    "text_quality", "dedup_containment",
    "source_overlap", "dedup_segments", "corpus_curriculum",
    "ipes_companies_full", "ann_pq_topk")

  /** Build a deterministic 10× replica of the sf0.1 tables the sf1
    * subset reads, once, under target/ (reused via _DONE marker).
    * Replicas are DISTINCT documents — alternate tokens carry a
    * replica tag, so no cross-replica shingle survives and the dedup
    * workload scales like 10× more corpus, not like a duplicate
    * explosion; keys in lineitem/orders shift so group counts scale
    * with the data; embedding replicas rotate the vector by the
    * replica index (norm-preserving, so no replica pair is a
    * spurious near-neighbor).
    */
  private def ensureSf1(spark: SparkSession, baseDir: String, sf1Dir: String): Unit = {
    // _DONE_r5: marker versioned when the replica set grows (r5 added
    // embeddings for the PQ-family sf1 entry) so a stale dir rebuilds.
    if (new java.io.File(s"$sf1Dir/_DONE_r5").exists()) return
    val reps = 10
    // Replica key offsets assume the base id ranges below; a silently
    // grown fixture would make replicas collide and turn the scaling
    // run into a duplicate-heavy corpus — fail generation loudly.
    def assertStride(df: DataFrame, keyCol: String, stride: Long): Unit = {
      val mx = df.agg(max(col(keyCol))).head.getLong(0)
      require(mx < stride,
        s"sf1 replica stride violated: max($keyCol)=$mx >= $stride")
    }
    assertStride(Tables.lineitem(spark, baseDir), "l_orderkey", 100000000L)
    assertStride(Tables.orders(spark, baseDir), "o_orderkey", 100000000L)
    assertStride(Tables.orders(spark, baseDir), "o_custkey", 10000000L)
    assertStride(Tables.documents(spark, baseDir), "doc_id", 1000000L)
    assertStride(Tables.embeddings(spark, baseDir), "vec_id", 10000000L)
    // the replica rotation below slices at dimension 64 — a silently
    // grown/changed fixture would write malformed (wrong-length)
    // vectors that only surface later as a PQ/KNN failure.
    val dims = Tables.embeddings(spark, baseDir)
      .select(size(col("embedding")).as("d")).agg(min("d"), max("d")).head
    require(!dims.isNullAt(0) && dims.getInt(0) == 64 && dims.getInt(1) == 64,
      s"sf1 embedding replica assumes dim 64, fixture has " +
        s"[${dims.get(0)}, ${dims.get(1)}]")
    def write(name: String, make: Int => DataFrame): Unit =
      (0 until reps).map(make).reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$sf1Dir/$name.parquet")
    write("lineitem", i => Tables.lineitem(spark, baseDir)
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
    write("orders", i => Tables.orders(spark, baseDir)
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
      .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L)))
    write("documents", i => {
      val d = Tables.documents(spark, baseDir)
      if (i == 0) d
      else d
        .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .withColumn("text", concat_ws(" ",
          transform(split(col("text"), "\\s+"),
            (t, idx) => when(idx % 2 === 0, concat(t, lit(s"_r$i"))).otherwise(t))))
    })
    write("embeddings", i => {
      val e = Tables.embeddings(spark, baseDir)
      if (i == 0) e
      else e
        .withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
        .withColumn("embedding", concat(
          slice(col("embedding"), i + 1, 64 - i), slice(col("embedding"), 1, i)))
    })
    new java.io.File(s"$sf1Dir/_DONE_r5").createNewFile()
  }

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split("\\s+").take(3).mkString(" ")
    catch { case _: Throwable => "unavailable" }

  private def load1(): Double =
    try loadavg().split("\\s+")(0).toDouble catch { case _: Throwable => 0.0 }

  /** Start gate: wait (in 15 s steps, up to `maxWaitSec`) for the
    * 1-min loadavg to drop under `gate` before the first timed trial —
    * a run that starts on a busy box is wasted no matter how well it
    * flags itself afterwards. Returns seconds waited. gate <= 0
    * disables.
    */
  private def waitForQuiet(gate: Double, maxWaitSec: Int): Int = {
    var waited = 0
    while (gate > 0 && load1() > gate && waited < maxWaitSec) {
      System.err.println(f"[bench] load gate: 1-min loadavg ${load1()}%.2f > " +
        f"$gate%.1f, waiting (${waited}s/${maxWaitSec}s)")
      Thread.sleep(15000)
      waited += 15
    }
    waited
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  private def spreadOf(ts: Seq[Double]): Double =
    if (ts.isEmpty || ts.min <= 0) 1.0 else median(ts) / ts.min

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt.max(1)
    val gateWaitSec = waitForQuiet(
      sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE", "2.0").toDouble,
      sys.env.getOrElse("SPARK_GRAFT_GATE_WAIT_SEC", "600").toInt)
    val loadStart = loadavg()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup: JIT the write path, list files, load parquet
    // footers so the first timed query doesn't pay session cold-start.
    // Reads go through Tables.* — events.parquet is TIMESTAMP(NANOS)
    // and needs the legacy-nanos workaround a raw read would miss.
    spark.range(1000000).selectExpr("sum(id) AS s")
      .write.format("noop").mode("overwrite").save()
    val warm: Seq[(SparkSession, String) => DataFrame] = Seq(
      Tables.lineitem, Tables.orders, Tables.customer,
      Tables.documents, Tables.embeddings, Tables.events)
    warm.foreach { t =>
      try t(spark, sfDir).limit(1).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup failed: ${e.getMessage}")
      }
    }

    // Between-trial isolation, OUTSIDE the timed span: drop cached
    // plans and nudge GC so the ContextCleaner frees orphaned
    // localCheckpoint blocks. Stale blocks from earlier queries
    // otherwise sit in storage memory until a (rare, at this heap
    // size) full GC, and later queries pay their eviction churn —
    // round-3 forensics measured up to 4× inflation on the late heavy
    // queries from exactly this cross-query pollution.
    def isolateIn(s: SparkSession): Unit = {
      s.catalog.clearCache()
      // localCheckpoint() blocks are NOT covered by clearCache(): they
      // are freed when the RDD object is GC'd, which can lag whole
      // queries behind in a long bench session — the accumulated
      // storage squeezes execution memory and the late heavy queries
      // spill (measured up to 5x inflation on the sf1 dedup stage vs a
      // fresh session). Unpersist them eagerly by enumeration.
      s.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }

    /** Run `name` for `n` timed trials in session `s` against `dir`;
      * returns per-trial seconds, or None (with the error recorded)
      * if a trial fails. `budgetSec` caps the heavy tail: once ≥2
      * trials are in and their cumulative time exceeds it, stop —
      * min-of-2 still debiases ambient load, and the cap keeps the
      * 10× tier inside the round's wall-clock budget.
      */
    def runTrials(s: SparkSession, dir: String, name: String, n: Int,
                  errs: scala.collection.mutable.Map[String, String],
                  budgetSec: Double = Double.MaxValue): Option[Seq[Double]] = {
      SparkEntry.queries.get(name) match {
        case None => errs(name) = "query not registered"; None
        case Some(fn) =>
          val times = scala.collection.mutable.ArrayBuffer.empty[Double]
          var trial = 0
          while (trial < n && !errs.contains(name) &&
                 (times.size < 2 || times.sum < budgetSec)) {
            val t0 = System.nanoTime()
            try {
              fn(s, dir).write.format("noop").mode("overwrite").save()
              times += (System.nanoTime() - t0) / 1e9
            } catch { case e: Throwable =>
              errs(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
                .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            }
            isolateIn(s)
            trial += 1
          }
          if (errs.contains(name)) None else Some(times.toSeq)
      }
    }

    /** Bounded noise recovery: a query whose median/min spread exceeds
      * 1.5× after the base trials gets up to 2 extra trials — one more
      * clean sample is usually enough to pull median toward min (or
      * confirm the min). Queries still flagged afterwards headline
      * their MIN (see reporting).
      */
    def runWithRecovery(s: SparkSession, dir: String, name: String, n: Int,
                        errs: scala.collection.mutable.Map[String, String],
                        budgetSec: Double = Double.MaxValue): Option[Seq[Double]] =
      runTrials(s, dir, name, n, errs, budgetSec).map { ts0 =>
        var ts = ts0
        var extra = 0
        while (spreadOf(ts) > 1.5 && extra < 2 && !errs.contains(name)) {
          System.err.println(f"[bench] $name spread ${spreadOf(ts)}%.2f > 1.5, " +
            s"recovery trial ${extra + 1}/2")
          runTrials(s, dir, name, 1, errs).foreach(ts ++= _)
          extra += 1
        }
        ts
      }.filter(_ => !errs.contains(name))

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results: Seq[(String, Seq[Double])] = Headline.flatMap { name =>
      runWithRecovery(spark, sfDir, name, trials, errors).map(name -> _)
    }

    // sf1 (10×) scaling run — SPARK_GRAFT_SF1=0 disables; failures are
    // recorded in sf1_errors without failing the main bench contract.
    // The subset runs in a FRESH SparkSession (same JVM, so the JIT
    // stays warm): a session that has already executed the 20+ sf0.1
    // headliners drags the late heavy sf1 queries 2–5× (measured 54 s
    // and 114 s for dedup_corpus_composed in-bench vs 23 s standalone,
    // with eager unpersist already in place — accumulated session
    // state, not storage blocks, is the drag), which would misreport
    // the scaling CURVE the subset exists to measure.
    val sf1Errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val sf1Results: Seq[(String, Seq[Double])] =
      if (sys.env.getOrElse("SPARK_GRAFT_SF1", "1") != "1") Seq.empty
      else {
        val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
          new java.io.File("target/sf1").getAbsolutePath)
        val sf1Trials = sys.env.getOrElse("SPARK_GRAFT_SF1_TRIALS", trials.toString)
          .toInt.max(1)
        val generated =
          try { ensureSf1(spark, sfDir, sf1Dir); true }
          catch { case e: Throwable =>
            sf1Errors("_generate") = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
            false
          }
        if (!generated) Seq.empty
        else {
          spark.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
          var spark1: SparkSession = null
          try {
            spark1 = SparkSession.builder()
              .master(s"local[$cpus]")
              .appName("graft-bench-sf1")
              .config("spark.sql.shuffle.partitions", cpus)
              .config("spark.sql.adaptive.enabled", "true")
              .config("spark.sql.session.timeZone", "UTC")
              .config("spark.ui.enabled", "false")
              .withExtensions(new graft.plans.GraftExtensions)
              .getOrCreate()
            spark1.sparkContext.setLogLevel("WARN")
            Sf1Headline.flatMap { name =>
              // 60 s per-query trial budget: the heavy tail (composed
              // dedup, full IPES at 10×) gets 2 trials instead of 3.
              runWithRecovery(spark1, sf1Dir, name, sf1Trials, sf1Errors,
                budgetSec = 60.0).map(name -> _)
            }
          } catch { case e: Throwable =>
            sf1Errors("_sf1_session") = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
            Seq.empty
          } finally {
            if (spark1 != null)
              try spark1.stop() catch { case _: Throwable => }
          }
        }
      }

    val loadEnd = loadavg()
    def f2(v: Double): String = f"$v%.2f"
    def f3(v: Double): String = f"$v%.3f"
    def flagged(ts: Seq[Double]): Boolean = spreadOf(ts) > 1.5
    // headline per query: median normally; MIN when the noise flag
    // persisted through recovery (load only ever adds time, so min is
    // the best available estimate of the code's cost on a noisy box).
    def headlineOf(ts: Seq[Double]): Double =
      if (flagged(ts)) ts.min else median(ts)
    def jObj(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

    val qs = jObj(results.map { case (k, ts) => k -> f2(headlineOf(ts)) })
    val sf1Qs = jObj(sf1Results.map { case (k, ts) => k -> f2(headlineOf(ts)) })
    val errs = jObj(errors.toSeq.map { case (k, v) => k -> s""""$v"""" })
    val sf1Errs = jObj(sf1Errors.toSeq.map { case (k, v) => k -> s""""$v"""" })
    // tier-prefixed flag list (the r5 stdout had DUPLICATE keys when a
    // query was noisy in both tiers), worst-first; stdout carries the
    // worst 5, the file artifact carries all of them.
    val flaggedAll: Seq[(String, Seq[Double])] =
      (results.map { case (k, ts) => k -> ts } ++
        sf1Results.map { case (k, ts) => s"sf1:$k" -> ts })
        .filter { case (_, ts) => flagged(ts) }
        .sortBy { case (_, ts) => -spreadOf(ts) }
    val noisyJs = jObj(flaggedAll.take(5).map { case (k, ts) => k -> f2(spreadOf(ts)) })
    val minJs = jObj(flaggedAll.take(5).map { case (k, ts) => k -> f2(ts.min) })
    val nRun = results.size + sf1Results.size
    val rejected = nRun > 0 && flaggedAll.size * 3 > nRun
    val total = results.map { case (_, ts) => headlineOf(ts) }.sum

    // FULL artifact → repo file: per-trial times, median/min/headline/
    // spread for every query, nothing truncated.
    val fullPath = "bench/BENCH_local.json"
    try {
      def tierJs(rs: Seq[(String, Seq[Double])]): String =
        jObj(rs.map { case (k, ts) =>
          k -> jObj(Seq(
            "headline" -> f3(headlineOf(ts)),
            "median" -> f3(median(ts)),
            "min" -> f3(ts.min),
            "spread" -> f2(spreadOf(ts)),
            "flagged" -> flagged(ts).toString,
            "trials" -> ts.map(f3).mkString("[", ",", "]")))
        })
      val full = jObj(Seq(
        "sf" -> s""""$sfDir"""",
        "trials" -> trials.toString,
        "cpus" -> cpus,
        "wait_gate_sec" -> gateWaitSec.toString,
        "loadavg_start" -> s""""$loadStart"""",
        "loadavg_end" -> s""""$loadEnd"""",
        "rejected" -> rejected.toString,
        "queries" -> tierJs(results),
        "errors" -> errs,
        "sf1_queries" -> tierJs(sf1Results),
        "sf1_errors" -> sf1Errs))
      new java.io.File("bench").mkdirs()
      java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath), full)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] full-artifact write failed: ${e.getMessage}")
    }

    // COMPACT stdout line (the driver's stdout-tail capture keeps ~2 KB;
    // r5's line outgrew it and recorded parsed:null): 2-decimal
    // headline numbers, mins only for the worst-5 flagged queries.
    println(s"""{"metric":"total","value":${f2(total)},"unit":"sec","trials":$trials,"queries":$qs,"errors":$errs,"sf":"$sfDir","sf1_queries":$sf1Qs,"sf1_errors":$sf1Errs,"loadavg_start":"$loadStart","loadavg_end":"$loadEnd","wait_gate_sec":$gateWaitSec,"noisy":${flaggedAll.nonEmpty},"noisy_queries":$noisyJs,"min":$minJs,"rejected":$rejected,"full":"$fullPath"}""")
    try spark.stop() catch { case _: Throwable => } // no-op if sf1 already stopped it
    if (errors.nonEmpty) sys.exit(1)
  }
}
