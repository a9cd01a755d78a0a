package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.{Enrich, IpesPipeline}

/** End-to-end IPES pipeline queries over a bronze layer synthesized
  * deterministically from `orders` (filing-shaped rows: entity names
  * with suffix/plural/blocklist/individual variants, app-type mix,
  * "; "-packed URL lists).
  *
  * `ipes_companies` / `ipes_filings_fact` run the WHOLE bronze→silver
  * stage (filters → normalize → group → dedup → gate → star emit) with
  * the plural-only dedup and name-keyed ids so a DuckDB oracle can
  * replay every step. `ipes_companies_full` is the production
  * configuration (Ratcliff–Obershelp 0.95 + uuid5 ids), ALSO fully
  * oracled: difflib block-matching, connected components, and SHA-1
  * are each replayed with recursive CTEs (RecursiveOracleSql), putting
  * the end-to-end pipeline under the hash gate; IpesPipelineSpec pins
  * it independently. `enrich_stub` runs the gold stage's
  * mapPartitions effect boundary with the deterministic offline stub.
  */
object IpesQueries extends QueryRegistry {

  def bronzeFromOrders(s: SparkSession, dir: String): DataFrame = {
    val name =
      when(col("o_custkey") % 6 === 0, lit("Wireline Competition Bureau"))
        .when(col("o_custkey") % 6 === 1, lit("John Smith"))
        .when(col("o_custkey") % 6 === 2, lit("Acme Telecom Services LLC"))
        .when(col("o_custkey") % 6 === 3,
          when(col("o_orderkey") % 2 === 0, lit("Stratus Network"))
            .otherwise(lit("Stratus Networks")))
        .when(col("o_custkey") % 6 === 4, lit("Broadband Dynamics Inc"))
        .otherwise(concat(lit("Vendor "), col("o_custkey") % 40,
          lit(" Communications Co")))
    val urls = concat(lit("https://www.fcc.gov/ecfs/document/"), col("o_orderkey"), lit("/1"))
    Tables.orders(s, dir).select(
      col("o_orderkey").cast("string").as("submission_id"),
      name.as("company_name"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("date_received"),
      when(col("o_orderkey") % 4 === 0, lit("APPLICATION FOR 214 AUTHORIZATION"))
        .when(col("o_orderkey") % 4 === 1, lit("COMMENT"))
        .when(col("o_orderkey") % 4 === 2, lit("Petition for Reconsideration"))
        .otherwise(lit("REQUEST FOR WAIVER")).as("submission_type"),
      when(col("o_orderkey") % 3 === 0, lit("INBOX-52.15"))
        .when(col("o_orderkey") % 3 === 1, lit("25-100"))
        .otherwise(lit("RM-99")).as("docket_number"),
      when(col("o_orderkey") % 3 === 0,
        lit("VoIP Numbering Authorization Application (Fee Required)"))
        .when(col("o_orderkey") % 3 === 1,
          lit("Section 52.15 direct access fee filing"))
        .otherwise(lit("Unrelated proceeding")).as("proceeding_description"),
      lit("").as("bureau"),
      lit("DISSEMINATED").as("filing_status"),
      lit("").as("contact_attorney"),
      lit("").as("law_firm"),
      when(col("o_orderkey") % 2 === 0,
        concat(urls, lit("; https://www.fcc.gov/ecfs/document/"),
          col("o_orderkey"), lit("/2")))
        .otherwise(urls).as("document_urls"),
      concat(lit("https://www.fcc.gov/ecfs/filing/"), col("o_orderkey"))
        .as("detail_url"))
      // local parquet at this SF is one row group = one scan task; the
      // downstream regex chain is CPU-bound, so spread it (a 150k-row
      // shuffle is noise; at cluster scale the scan parallelizes itself
      // and this becomes a no-op-sized exchange before heavy compute).
      .repartition(s.sparkContext.defaultParallelism)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ipes_companies" -> ((s, dir) =>
      IpesPipeline.structure(bronzeFromOrders(s, dir),
          ratioThreshold = 2.0, withId = false)
        .companies
        .select("entity_name", "normalized_name", "entity_type",
          "filing_count", "latest_filing_date")),

    "ipes_filings_fact" -> ((s, dir) =>
      IpesPipeline.structure(bronzeFromOrders(s, dir),
          ratioThreshold = 2.0, withId = false)
        .filings),

    "ipes_companies_full" -> ((s, dir) =>
      IpesPipeline.structure(bronzeFromOrders(s, dir)).companies),

    "enrich_stub" -> ((s, dir) => {
      import s.implicits._
      val st = IpesPipeline.structure(bronzeFromOrders(s, dir),
        ratioThreshold = 2.0, withId = false)
      // A6 context into the effect: distinct dockets per company, the
      // aggregation the reference feeds its LLM prompt.
      val dockets = st.filings.groupBy(col("company_id"))
        .agg(array_sort(collect_set(col("docket_number"))).as("dockets"))
      val keys = st.companies
        .join(dockets, st.companies("normalized_name") === dockets("company_id"))
        .select(col("normalized_name").as("id"), col("normalized_name"),
          col("filing_count"), col("dockets")).as[Enrich.CompanyKey]
      Enrich.enrichAll(keys).toDF()
        .select("normalized_name", "filing_count", "is_active",
          "activity_signal", "industry_segment", "product_summary",
          "market_position", "docket_context")
    }),
  )

  // ---- shared oracle SQL fragments ----

  private val bronzeSql =
    """SELECT CAST(o_orderkey AS VARCHAR) AS submission_id,
      |  CASE o_custkey % 6
      |    WHEN 0 THEN 'Wireline Competition Bureau'
      |    WHEN 1 THEN 'John Smith'
      |    WHEN 2 THEN 'Acme Telecom Services LLC'
      |    WHEN 3 THEN CASE WHEN o_orderkey % 2 = 0 THEN 'Stratus Network' ELSE 'Stratus Networks' END
      |    WHEN 4 THEN 'Broadband Dynamics Inc'
      |    ELSE 'Vendor ' || (o_custkey % 40) || ' Communications Co' END AS company_name,
      |  strftime(o_orderdate, '%Y-%m-%d') AS date_received,
      |  CASE o_orderkey % 4 WHEN 0 THEN 'APPLICATION FOR 214 AUTHORIZATION'
      |    WHEN 1 THEN 'COMMENT' WHEN 2 THEN 'Petition for Reconsideration'
      |    ELSE 'REQUEST FOR WAIVER' END AS submission_type,
      |  CASE o_orderkey % 3 WHEN 0 THEN 'INBOX-52.15' WHEN 1 THEN '25-100'
      |    ELSE 'RM-99' END AS docket_number,
      |  CASE o_orderkey % 3 WHEN 0 THEN 'VoIP Numbering Authorization Application (Fee Required)'
      |    WHEN 1 THEN 'Section 52.15 direct access fee filing'
      |    ELSE 'Unrelated proceeding' END AS proceeding_description,
      |  'DISSEMINATED' AS filing_status,
      |  CASE WHEN o_orderkey % 2 = 0
      |    THEN 'https://www.fcc.gov/ecfs/document/' || o_orderkey || '/1; https://www.fcc.gov/ecfs/document/' || o_orderkey || '/2'
      |    ELSE 'https://www.fcc.gov/ecfs/document/' || o_orderkey || '/1' END AS document_urls
      |FROM orders""".stripMargin

  private[registry] def normChain(inner: String): String = s"""
    |trim(regexp_replace(
    |  regexp_replace(
    |    regexp_replace(
    |      regexp_replace(
    |        regexp_replace(
    |          regexp_replace(trim(lower($inner)),
    |            '(?i)\\b(llc|l\\.l\\.c\\.?|inc\\.?|incorporated|corp\\.?|corporation|co\\.?|company)\\b', '', 'g'),
    |          '(?i)\\b(ltd\\.?|limited|lp|l\\.p\\.?|llp|l\\.l\\.p\\.?)\\b', '', 'g'),
    |        '(?i)\\b(pllc|p\\.l\\.l\\.c\\.?|pc|p\\.c\\.?)\\b', '', 'g'),
    |      '(?i),?\\s*(d/?b/?a|doing business as)\\s+.*$$', '', 'g'),
    |    '[^\\w\\s]', ' ', 'g'),
    |  '\\s+', ' ', 'g'))""".stripMargin.replace("\n", " ")

  private def isIndividual(c: String): String = s"""
    |(len(regexp_split_to_array(trim($c), '\\s+')) <= 3
    | AND NOT (contains(lower($c), 'llc') OR contains(lower($c), 'inc') OR
    |   contains(lower($c), 'corp') OR contains(lower($c), 'company') OR
    |   contains(lower($c), 'co.') OR contains(lower($c), 'communications') OR
    |   contains(lower($c), 'telecom') OR contains(lower($c), 'voip') OR
    |   contains(lower($c), 'network') OR contains(lower($c), 'services') OR
    |   contains(lower($c), 'solutions')))""".stripMargin.replace("\n", " ")

  /** bronze → relevance/blocklist filter → non-empty normalized names. */
  private val relNormCtes = s"""
    |bronze AS ($bronzeSql),
    |rel AS (
    |  SELECT * FROM bronze
    |  WHERE (lower(proceeding_description) LIKE '%voip%'
    |      OR lower(proceeding_description) LIKE '%52.15%'
    |      OR lower(docket_number) LIKE '%inbox-52.15%')
    |    AND NOT (regexp_matches(lower(company_name), 'wireline competition bureau')
    |      OR regexp_matches(lower(company_name), '^fcc\\b')
    |      OR regexp_matches(lower(company_name), 'federal communications commission')
    |      OR regexp_matches(lower(company_name), 'national telecommunications and information')
    |      OR regexp_matches(lower(company_name), 'department of justice')
    |      OR regexp_matches(lower(company_name), 'national association of regulatory'))),
    |norm AS MATERIALIZED (
    |  SELECT *, ${normChain("company_name")} AS normalized_raw FROM rel
    |  WHERE ${normChain("company_name")} <> '')""".stripMargin

  /** canonical-name group-merge + applicant/individual gate, from a
    * `wc` CTE carrying norm rows plus their `normalized_name`.
    */
  private val groupedGatedCtes = s"""
    |grouped AS (
    |  SELECT normalized_name,
    |    arg_max(company_name,
    |      lpad(CAST(length(company_name) AS VARCHAR), 4, '0') || company_name) AS entity_name,
    |    COUNT(*) AS filing_count,
    |    MAX(date_received) AS latest_filing_date,
    |    bool_or(regexp_matches(upper(submission_type), 'APPLICATION|REQUEST|PETITION')) AS is_applicant
    |  FROM wc GROUP BY normalized_name),
    |gated AS MATERIALIZED (
    |  SELECT * FROM grouped
    |  WHERE is_applicant AND NOT ${isIndividual("entity_name")})""".stripMargin

  /** bronze → filtered → normalized → plural-dedup'd → grouped → gated. */
  private val structuredCte = s"""
    |WITH $relNormCtes,
    |keys AS (SELECT DISTINCT normalized_raw AS name FROM norm),
    |canon AS (
    |  SELECT name,
    |    CASE WHEN right(name, 1) = 's'
    |           AND substr(name, 1, length(name) - 1) IN (SELECT name FROM keys)
    |         THEN substr(name, 1, length(name) - 1) ELSE name END AS normalized_name
    |  FROM keys),
    |wc AS (SELECT n.*, c.normalized_name FROM norm n JOIN canon c ON n.normalized_raw = c.name),
    |$groupedGatedCtes""".stripMargin

  /** The production configuration: FuzzyDedup canonical map (difflib
    * ratio 0.95 + plural rule, connected components — replayed with
    * recursive CTEs) and uuid5 ids (SHA-1 replayed likewise).
    */
  private val structuredFullCte = s"""
    |WITH RECURSIVE $relNormCtes,
    |${RecursiveOracleSql.fuzzyCanonCtes("SELECT DISTINCT normalized_raw AS name FROM norm")},
    |wc AS (SELECT n.*, c.canonical AS normalized_name FROM norm n JOIN fz_canon c ON n.normalized_raw = c.name),
    |$groupedGatedCtes,
    |${RecursiveOracleSql.uuid5Ctes(
       "(SELECT normalized_name AS uid, normalized_name AS uname FROM gated)")}""".stripMargin

  def oracle: Map[String, String] = Map(
    "ipes_companies" -> s"""$structuredCte
      |SELECT entity_name, normalized_name, 'Company' AS entity_type,
      |  filing_count, latest_filing_date
      |FROM gated""".stripMargin,

    "ipes_filings_fact" -> s"""$structuredCte
      |SELECT g.normalized_name AS company_id,
      |  w.submission_id AS filing_id, w.date_received, w.docket_number,
      |  w.submission_type, w.filing_status AS status,
      |  string_split(w.document_urls, '; ')[1] AS primary_doc_url
      |FROM wc w JOIN gated g ON w.normalized_name = g.normalized_name""".stripMargin,

    "ipes_companies_full" -> s"""$structuredFullCte
      |SELECT o.u5 AS id, g.entity_name, g.normalized_name,
      |  'Company' AS entity_type, g.filing_count, g.latest_filing_date
      |FROM gated g JOIN u5_out o ON o.uid = g.normalized_name""".stripMargin,

    "enrich_stub" -> s"""$structuredCte,
      |dockets AS (
      |  SELECT g.normalized_name,
      |    COUNT(DISTINCT w.docket_number) AS n_dockets,
      |    string_agg(DISTINCT w.docket_number, '; ' ORDER BY w.docket_number)
      |      AS docket_context
      |  FROM wc w JOIN gated g ON w.normalized_name = g.normalized_name
      |  GROUP BY g.normalized_name)
      |SELECT g.normalized_name, g.filing_count,
      |  ascii(substr(md5(g.normalized_name), 3, 1)) % 2 = 0 AS is_active,
      |  g.filing_count || ' filings on record across ' || d.n_dockets || ' dockets'
      |    AS activity_signal,
      |  (['UCaaS','CCaaS','CPaaS','Carrier','Reseller','Enterprise IT','Healthcare',
      |    'Financial Services','Government','Consulting/Legal','Unknown'])[
      |    ascii(substr(md5(g.normalized_name), 1, 1)) % 11 + 1] AS industry_segment,
      |  'Provider of ' || g.normalized_name || ' services' AS product_summary,
      |  (['Enterprise','Mid-Market','SMB','Startup','Unknown'])[
      |    ascii(substr(md5(g.normalized_name), 2, 1)) % 5 + 1] AS market_position,
      |  d.docket_context
      |FROM gated g JOIN dockets d ON g.normalized_name = d.normalized_name""".stripMargin,
  )
}
