package graft.etl

import org.apache.spark.sql.types._

/** Layered schemas for the IPES pipeline (SURVEY §1).
  *
  * Bronze mirrors `normalize_filing`'s flat 12-string-column output
  * (`code/fetch.py:178-191`); silver is the validated star schema
  * (`code/schemas.py:5-29`); gold adds the typed enrichment struct
  * (`code/enrich_data.py:65-78`).
  */
object IpesSchemas {

  /** Bronze: flat filing record, everything a string (schema-on-read). */
  val bronze: StructType = StructType(Seq(
    StructField("submission_id", StringType),
    StructField("company_name", StringType),
    StructField("date_received", StringType),
    StructField("submission_type", StringType),
    StructField("docket_number", StringType),
    StructField("proceeding_description", StringType),
    StructField("bureau", StringType),
    StructField("filing_status", StringType),
    StructField("contact_attorney", StringType),
    StructField("law_firm", StringType),
    StructField("document_urls", StringType),
    StructField("detail_url", StringType)))

  /** Silver: one filing nested under a company. */
  case class Filing(
      filing_id: String,
      date_received: String,
      docket_number: String,
      submission_type: String,
      filing_status: String,
      document_urls: Seq[String],
      detail_url: String)

  /** Silver: company dimension row (`code/schemas.py:20-29`). */
  case class Company(
      id: String,
      entity_name: String,
      normalized_name: String,
      entity_type: String,
      is_applicant: Boolean,
      filing_count: Long,
      latest_filing_date: String,
      filings: Seq[Filing])

  /** Gold: typed enrichment (`code/enrich_data.py:65-78`). */
  case class Enrichment(
      is_active: Boolean,
      activity_signal: String,
      industry_segment: String,
      product_summary: String,
      market_position: String)

  val IndustrySegments: Seq[String] = Seq(
    "UCaaS", "CCaaS", "CPaaS", "Carrier", "Reseller", "Enterprise IT",
    "Healthcare", "Financial Services", "Government", "Consulting/Legal",
    "Unknown")

  val MarketPositions: Seq[String] = Seq(
    "Enterprise", "Mid-Market", "SMB", "Startup", "Unknown")
}
