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
    "corpus_curriculum")

  /** The 10× scaling checkpoint: a subset chosen to answer the two
    * empirical questions a 100 TB plan review asks — where the
    * composed LSH dedup crosses over the capped exact-Jaccard form,
    * and how the native top-k gap vs the window form grows with data.
    */
  private val Sf1Headline = Seq(
    "q1_agg", "w1_latest_per_group", "w1_latest_native",
    "dedup_ngram_jaccard_capped", "dedup_corpus_composed", "corpus_prep",
    "text_quality", "dedup_containment")

  /** Build a deterministic 10× replica of the sf0.1 tables the sf1
    * subset reads, once, under target/ (reused via _DONE marker).
    * Replicas are DISTINCT documents — alternate tokens carry a
    * replica tag, so no cross-replica shingle survives and the dedup
    * workload scales like 10× more corpus, not like a duplicate
    * explosion; keys in lineitem/orders shift so group counts scale
    * with the data.
    */
  private def ensureSf1(spark: SparkSession, baseDir: String, sf1Dir: String): Unit = {
    if (new java.io.File(s"$sf1Dir/_DONE").exists()) return
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
    new java.io.File(s"$sf1Dir/_DONE").createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    // Between-query isolation, OUTSIDE the timed span: drop cached
    // plans and nudge GC so the ContextCleaner frees orphaned
    // localCheckpoint blocks. Stale blocks from earlier queries
    // otherwise sit in storage memory until a (rare, at this heap
    // size) full GC, and later queries pay their eviction churn —
    // round-3 forensics measured up to 4× inflation on the late heavy
    // queries from exactly this cross-query pollution.
    def isolate(): Unit = {
      spark.catalog.clearCache()
      // localCheckpoint() blocks are NOT covered by clearCache(): they
      // are freed when the RDD object is GC'd, which can lag whole
      // queries behind in a long bench session — the accumulated
      // storage squeezes execution memory and the late heavy queries
      // spill (measured up to 5x inflation on the sf1 dedup stage vs a
      // fresh session). Unpersist them eagerly by enumeration.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = Headline.flatMap { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          }
          val dt = (System.nanoTime() - t0) / 1e9
          isolate()
          Some(name -> dt)
        case None =>
          errors(name) = "query not registered"
          None
      }
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
    val sf1Results: Seq[(String, Double)] =
      if (sys.env.getOrElse("SPARK_GRAFT_SF1", "1") != "1") Seq.empty
      else {
        val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
          new java.io.File("target/sf1").getAbsolutePath)
        try {
          ensureSf1(spark, sfDir, sf1Dir)
          spark.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
          val spark1 = SparkSession.builder()
            .master(s"local[$cpus]")
            .appName("graft-bench-sf1")
            .config("spark.sql.shuffle.partitions", cpus)
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .withExtensions(new graft.plans.GraftExtensions)
            .getOrCreate()
          spark1.sparkContext.setLogLevel("WARN")
          def isolate1(): Unit = {
            spark1.catalog.clearCache()
            spark1.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = false))
            System.gc()
          }
          val out = Sf1Headline.flatMap { name =>
            val t0 = System.nanoTime()
            try SparkEntry.queries(name)(spark1, sf1Dir)
              .write.format("noop").mode("overwrite").save()
            catch { case e: Throwable =>
              sf1Errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
                .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
              System.err.println(s"[bench] sf1 $name FAILED: ${e.getMessage}")
            }
            val dt = (System.nanoTime() - t0) / 1e9
            isolate1()
            Some(name -> dt)
          }
          spark1.stop()
          out
        } catch { case e: Throwable =>
          sf1Errors("_generate") = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
          Seq.empty
        }
      }

    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val sf1Qs = sf1Results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val sf1Errs = sf1Errors.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","sf1_queries":$sf1Qs,"sf1_errors":$sf1Errs}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
