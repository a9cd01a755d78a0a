package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{DownloadSink, Readers, Writers}

/** The reference's `run_pipeline.py` as one composed driver
  * (SURVEY §3.1): bronze → structure → validate → silver star outputs →
  * cached enrichment → incremental document downloads → run-stats
  * append. Layer boundaries are parquet/CSV writes; each stage is a
  * `DataFrame => DataFrame` library call, so any subset can run
  * standalone.
  */
object Pipeline {

  case class Config(
      bronzePath: String,
      outDir: String,
      ratioThreshold: Double = 0.95,
      docLimit: Int = 0,
      runTs: String = "1970-01-01T00:00:00Z",
      fetch: String => Either[String, Array[Byte]] = _ => Left("offline"))

  case class RunStats(
      companies: Long, filings: Long, validCompanies: Long,
      invalidCompanies: Long, enriched: Long, cacheHits: Long,
      downloadsOk: Long, downloadsFailed: Long)

  def run(spark: SparkSession, conf: Config): RunStats = {
    // Stage 1-2: bronze (tolerant JSON lines) -> silver star schema.
    val bronze = Readers.jsonLines(spark, IpesSchemas.bronze, conf.bronzePath)
      .filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val structured = IpesPipeline.structure(bronze, conf.ratioThreshold)

    // Validation gate (F15/A13) before anything is written.
    val split = Validate.split(structured.companies, Validate.companyConstraint)
    val companies = split.valid.cache()
    val filings = structured.filings.cache()

    Writers.csvOrdered(companies,
      Seq("id", "entity_name", "normalized_name", "entity_type",
        "filing_count", "latest_filing_date"),
      s"${conf.outDir}/structured/companies")
    Writers.csvOrdered(filings,
      Seq("company_id", "filing_id", "date_received", "docket_number",
        "submission_type", "status", "primary_doc_url"),
      s"${conf.outDir}/structured/filings")
    Writers.json(structured.nested, s"${conf.outDir}/structured/companies_nested")

    // Stage 3: enrichment with the persisted cache (J2 + write-back).
    val cachePath = s"${conf.outDir}/enrichment_cache"
    val cache0 =
      try spark.read.parquet(cachePath)
      catch { case _: Throwable =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "normalized_name STRING, is_active BOOLEAN, activity_signal STRING, " +
              "industry_segment STRING, product_summary STRING, market_position STRING, " +
              "docket_context STRING"))
      }
    val cacheHits = companies.join(cache0.select("normalized_name"),
      Seq("normalized_name"), "left_semi").count()
    // A6 context: the distinct docket set per company feeds the
    // enrichment effect (the reference folds it into the LLM prompt).
    val companyDockets = filings
      .groupBy(col("company_id"))
      .agg(array_sort(collect_set(col("docket_number"))).as("dockets"))
    val companiesWithContext = companies
      .join(companyDockets, companies("id") === companyDockets("company_id"), "left")
      .drop("company_id")
      .withColumn("dockets",
        coalesce(col("dockets"), array().cast("array<string>")))
    val (enriched, cache1) =
      Enrich.enrichWithCache(spark, companiesWithContext, cache0)
    enriched.write.mode("overwrite").parquet(s"${conf.outDir}/enriched")
    // materialize before swapping the cache dir: every frame above
    // still holds a lazy plan over the OLD cache files
    val enrichedCount = spark.read.parquet(s"${conf.outDir}/enriched").count()
    cache1.write.mode("overwrite").parquet(s"$cachePath.tmp")
    spark.read.parquet(s"$cachePath.tmp").write.mode("overwrite").parquet(cachePath)

    // Stage 4: incremental downloads (S9-S11) against the manifest.
    val manifestPath = s"${conf.outDir}/downloads"
    val manifest = {
      val dir = new java.io.File(manifestPath)
      val names = Option(dir.list()).getOrElse(Array.empty[String])
        .map { n =>
          val i = n.lastIndexOf('.')
          if (i >= 0) n.substring(0, i) else n
        }
      import spark.implicits._
      names.toSeq.toDF("filename")
    }
    val docQueue = filings.filter(col("primary_doc_url") =!= "")
      .join(companies.select(col("id"), col("entity_name")),
        filings("company_id") === col("id"))
      .select(col("filing_id").as("doc_id"), col("entity_name"),
        col("primary_doc_url").as("url"))
    val queue = DownloadSink.buildQueue(docQueue, manifest, conf.docLimit)
    val summary = DownloadSink.run(queue, manifestPath, conf.fetch)

    // Epilogue: append-history stats (S8).
    val stats = RunStats(
      companies.count(), filings.count(),
      companies.count(), split.invalid.count(),
      enrichedCount, cacheHits,
      summary.succeeded, summary.failed)
    import spark.implicits._
    Writers.appendHistory(
      Seq((stats.companies, stats.filings, stats.validCompanies,
        stats.invalidCompanies, stats.enriched, stats.cacheHits,
        stats.downloadsOk, stats.downloadsFailed))
        .toDF("companies", "filings", "valid_companies", "invalid_companies",
          "enriched", "cache_hits", "downloads_ok", "downloads_failed"),
      s"${conf.outDir}/monitoring/run_stats", conf.runTs)
    companies.unpersist()
    filings.unpersist()
    stats
  }
}
