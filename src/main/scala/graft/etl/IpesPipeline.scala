package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.FuzzyDedup
import graft.functions.GraftFunctions

/** Bronze → silver: the reference's `structure_data()` re-expressed as
  * one declarative plan (`code/structure_data.py:125-378`).
  *
  * Stage order matches the reference's hand-coded pushdown: relevance +
  * blocklist filters run BEFORE the quadratic dedup so the expensive
  * pass sees |distinct names|, not |rows| — except here Catalyst also
  * pushes the filters into the scan. The group-collect, argmax display
  * name, bool_or applicant flag, desc sort, and uuid5 id are all one
  * aggregation over a single shuffle on the canonical name.
  *
  * Scale: the only shuffles are (1) the canonical-name dedup join
  * (broadcast — |distinct names| is tiny relative to rows), (2) the
  * groupBy canonical name. Filings-per-company skew would show up in
  * the collect_list; at 100 TB pair it with AQE skew handling or cap
  * list length with slice().
  */
object IpesPipeline {

  /** Star-schema outputs + the nested silver form. */
  case class Structured(companies: DataFrame, filings: DataFrame, nested: DataFrame)

  def structure(
      bronze: DataFrame,
      ratioThreshold: Double = 0.95,
      exhaustive: Boolean = false,
      withId: Boolean = true,
      greedyDedup: Boolean = false): Structured = {

    val base = bronze
      .filter(
        Normalize.isRelevant(col("proceeding_description"), col("docket_number")) &&
          !Normalize.shouldExclude(col("company_name")))
      .withColumn("normalized_raw", Normalize.normalizeName(col("company_name")))
      .filter(col("normalized_raw") =!= "")

    val filingStruct = struct(
      col("submission_id").as("filing_id"),
      col("date_received"),
      col("docket_number"),
      col("submission_type"),
      col("filing_status"),
      when(col("document_urls").isNull || col("document_urls") === "",
        array().cast("array<string>"))
        .otherwise(split(col("document_urls"), "; ")).as("document_urls"),
      col("detail_url"))

    // Phase 1 — ONE pass over bronze: pre-aggregate per raw normalized
    // name, then materialize (localCheckpoint). The dedup stage runs an
    // eager edge-collect action and the final outputs run their own —
    // without the checkpoint each action would re-scan bronze and
    // re-run the regex chain; with it, bronze is scanned exactly once
    // and the blocks are freed by the ContextCleaner on GC.
    val perName = base
      .groupBy(col("normalized_raw"))
      .agg(
        max_by(col("company_name"),
          concat(lpad(length(col("company_name")).cast("string"), 4, "0"),
            col("company_name"))).as("entity_name"),
        count(lit(1)).as("filing_count"),
        bool_or(Normalize.isApplicationType(col("submission_type")))
          .as("is_applicant"),
        max(col("date_received")).as("_latest"),
        collect_list(struct(col("date_received").as("_k"), filingStruct.as("f")))
          .as("_fs"))
      .localCheckpoint()

    // J3 over the pre-aggregated name domain (no extra bronze pass).
    // greedyDedup = true replays the reference's order-dependent merge
    // exactly (bit-parity mode); default is the CC superset semantics.
    val canon = (if (greedyDedup) {
      val spark = bronze.sparkSession
      import spark.implicits._
      val keys = perName.select(col("normalized_raw")).collect().map(_.getString(0)).toSeq
      FuzzyDedup.greedyCanonicalMap(keys, ratioThreshold).toSeq
        .toDF("name", "canonical")
    } else {
      FuzzyDedup.canonicalMap(
        perName.select(col("normalized_raw").as("name")), "name",
        ratioThreshold, exhaustive)
    }).withColumnRenamed("canonical", "normalized_name")

    // Phase 2 — merge dedup'd groups: all aggregates re-combine
    // losslessly (max of max, sum of counts, or of ors, flatten of
    // lists), sorted newest-first at the end for determinism.
    val grouped = perName
      .join(broadcast(canon), perName("normalized_raw") === canon("name"))
      .groupBy(col("normalized_name"))
      .agg(
        max_by(col("entity_name"),
          concat(lpad(length(col("entity_name")).cast("string"), 4, "0"),
            col("entity_name"))).as("entity_name"),
        sum(col("filing_count")).as("filing_count"),
        bool_or(col("is_applicant")).as("is_applicant"),
        max(col("_latest")).as("_latest"),
        reverse(array_sort(flatten(collect_list(col("_fs"))))).as("_sorted"))
      .withColumn("filings", transform(col("_sorted"), x => x.getField("f")))
      .drop("_sorted")

    val gated = grouped
      .withColumn("is_individual", Normalize.isLikelyIndividual(col("entity_name")))
      .filter(col("is_applicant") && !col("is_individual"))
      .withColumn("entity_type", lit("Company"))
      .withColumn("latest_filing_date", coalesce(col("_latest"), lit("")))
      .drop("is_individual", "_latest")

    val nested = (if (withId)
      gated.withColumn("id", GraftFunctions.uuid5(col("normalized_name")))
    else gated.withColumn("id", col("normalized_name")))
      .select("id", "entity_name", "normalized_name", "entity_type",
        "is_applicant", "filing_count", "latest_filing_date", "filings")

    val companies = nested.select(
      col("id"), col("entity_name"), col("normalized_name"),
      col("entity_type"), col("filing_count"), col("latest_filing_date"))

    // J5: nest → fact rows (one per filing, FK to the company).
    val filings = nested
      .select(col("id").as("company_id"), explode(col("filings")).as("f"))
      .select(
        col("company_id"),
        col("f.filing_id").as("filing_id"),
        col("f.date_received").as("date_received"),
        col("f.docket_number").as("docket_number"),
        col("f.submission_type").as("submission_type"),
        col("f.filing_status").as("status"),
        coalesce(try_element_at(col("f.document_urls"), lit(1)), lit(""))
          .as("primary_doc_url"))

    Structured(companies, filings, nested)
  }
}
