package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    "stream_tumbling_hourly")

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
          Some(name -> (System.nanoTime() - t0) / 1e9)
        case None =>
          errors(name) = "query not registered"
          None
      }
    }

    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
