package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Normalize

/** Projection / derivation / filter family (SURVEY §2.2 F1–F15).
  *
  * Each query applies the library operator to testdata columns
  * (synthesizing entity-name-shaped inputs deterministically from row
  * keys where the star schema has no such column), with a DuckDB twin
  * computing the identical expression. F5 (truncation) is inside
  * f2_flatten_project; F12 (bureau post-filter) is a strict subset of
  * the F7 blocklist and is exercised by f7/f11.
  */
object EtlQueries extends QueryRegistry {

  /** Company-ish names synthesized over `part` (suffix by key mod 4). */
  private def partEntityName = concat(col("p_name"),
    when(col("p_partkey") % 4 === 0, lit(" LLC"))
      .when(col("p_partkey") % 4 === 1, lit(", Inc."))
      .when(col("p_partkey") % 4 === 2, lit(" Corp"))
      .otherwise(lit(" d/b/a Widgets Co")))

  private val partEntityNameSql =
    """p_name || CASE p_partkey % 4 WHEN 0 THEN ' LLC' WHEN 1 THEN ', Inc.'
      |  WHEN 2 THEN ' Corp' ELSE ' d/b/a Widgets Co' END""".stripMargin

  /** Mixed individual/company/blocked names over `customer` (mod 5). */
  private def custEntityName =
    when(col("c_custkey") % 5 === 0, lit("Wireline Competition Bureau"))
      .when(col("c_custkey") % 5 === 1, lit("John Smith"))
      .when(col("c_custkey") % 5 === 2, lit("Acme Telecom Services LLC"))
      .when(col("c_custkey") % 5 === 3, lit("Federal Communications Commission"))
      .otherwise(regexp_replace(col("c_name"), "#", " "))

  private val custEntityNameSql =
    """CASE c_custkey % 5 WHEN 0 THEN 'Wireline Competition Bureau'
      |  WHEN 1 THEN 'John Smith'
      |  WHEN 2 THEN 'Acme Telecom Services LLC'
      |  WHEN 3 THEN 'Federal Communications Commission'
      |  ELSE regexp_replace(c_name, '#', ' ', 'g') END""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f1_json_path" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        coalesce(get_json_object(col("props"), "$.k"), lit("")).as("k_val"))),

    "f2_flatten_project" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        substring(col("text"), 1, 200).as("excerpt"),
        concat(lit("https://example.org/docs/"), col("doc_id")).as("detail_url"),
        size(split(col("text"), " ")).as("n_words"),
        upper(col("source")).as("source_uc"))),

    "f3_first_nonempty" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        coalesce(
          try_element_at(filter(split(col("text"), " "),
            w => length(w) > 5), lit(1)),
          lit("")).as("first_long_word"))),

    "f4_date_trunc" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"), col("ts").cast("date").as("event_date"))),

    "f6_normalize_names" -> ((s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        partEntityName.as("entity_name"),
        Normalize.normalizeName(partEntityName).as("normalized_name"))),

    "f7_blocklist_filter" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), custEntityName.as("entity_name"))
        .filter(!Normalize.shouldExclude(col("entity_name")))),

    "f9_application_type" -> ((s, dir) => {
      val subType = when(col("o_orderkey") % 4 === 0, lit("APPLICATION FOR 214 AUTHORIZATION"))
        .when(col("o_orderkey") % 4 === 1, lit("COMMENT"))
        .when(col("o_orderkey") % 4 === 2, lit("Petition for Reconsideration"))
        .otherwise(lit("REQUEST FOR WAIVER"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), subType.as("submission_type"))
        .filter(Normalize.isApplicationType(col("submission_type")))
    }),

    "f10_individual_heuristic" -> ((s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        custEntityName.as("entity_name"),
        Normalize.isLikelyIndividual(custEntityName).as("is_individual"))),

    "f11_applicant_gate" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), custEntityName.as("entity_name"),
          (col("c_custkey") % 3 === 0).as("has_application"))
        .filter(col("has_application") &&
          !Normalize.isLikelyIndividual(col("entity_name")) &&
          !Normalize.shouldExclude(col("entity_name")))),

    "f13_filetype_classify" -> ((s, dir) => {
      val content = when(col("doc_id") % 4 === 0, lit("%PDF-1.7 stream"))
        .when(col("doc_id") % 4 === 1, lit("PKword/"))
        .otherwise(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        coalesce(Normalize.classifyFileType(content.cast("binary")), lit("bin"))
          .as("file_type"))
    }),

    "f14_sanitize_filename" -> ((s, dir) => {
      val raw = concat(lit("  "), col("p_name"), lit(" <"), col("p_brand"),
        lit(">: \"file/name?\""))
      Tables.part(s, dir).select(
        col("p_partkey"), Normalize.sanitizeFilename(raw).as("filename"))
    }),

    // uuid5 company ids over normalized names. DuckDB 1.0 has no
    // sha1(), so the oracle replays SHA-1 itself with a recursive CTE
    // (RecursiveOracleSql.uuid5Ctes); Uuid5Spec additionally pins the
    // expression against Python uuid.uuid5 vectors.
    "uuid5_company_id" -> ((s, dir) => {
      val norm = Normalize.normalizeName(partEntityName)
      Tables.part(s, dir).select(
        col("p_partkey"),
        norm.as("normalized_name"),
        graft.functions.GraftFunctions.uuid5(norm).as("company_id"))
    }),

    "f15_validation_split" -> ((s, dir) => {
      val valid = col("o_totalprice").between(2000, 450000)
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(when(valid, 1).otherwise(0)).as("n_valid"),
          sum(when(valid, 0).otherwise(1)).as("n_invalid"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "f1_json_path" ->
      """SELECT event_id, coalesce(json_extract_string(props, '$.k'), '') AS k_val
        |FROM events""".stripMargin,

    "f2_flatten_project" ->
      """SELECT doc_id,
        |  substring(text, 1, 200) AS excerpt,
        |  'https://example.org/docs/' || doc_id AS detail_url,
        |  len(string_split(text, ' ')) AS n_words,
        |  upper(source) AS source_uc
        |FROM documents""".stripMargin,

    "f3_first_nonempty" ->
      """SELECT doc_id,
        |  coalesce(list_filter(string_split(text, ' '), w -> length(w) > 5)[1], '')
        |    AS first_long_word
        |FROM documents""".stripMargin,

    "f4_date_trunc" ->
      "SELECT event_id, CAST(ts AS DATE) AS event_date FROM events",

    "f6_normalize_names" -> s"""
      |SELECT p_partkey, $partEntityNameSql AS entity_name,
      |  trim(regexp_replace(
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(
      |            regexp_replace(trim(lower($partEntityNameSql)),
      |              '(?i)\\b(llc|l\\.l\\.c\\.?|inc\\.?|incorporated|corp\\.?|corporation|co\\.?|company)\\b', '', 'g'),
      |            '(?i)\\b(ltd\\.?|limited|lp|l\\.p\\.?|llp|l\\.l\\.p\\.?)\\b', '', 'g'),
      |          '(?i)\\b(pllc|p\\.l\\.l\\.c\\.?|pc|p\\.c\\.?)\\b', '', 'g'),
      |        '(?i),?\\s*(d/?b/?a|doing business as)\\s+.*$$', '', 'g'),
      |      '[^\\w\\s]', ' ', 'g'),
      |    '\\s+', ' ', 'g')) AS normalized_name
      |FROM part""".stripMargin,

    "f7_blocklist_filter" -> s"""
      |SELECT c_custkey, $custEntityNameSql AS entity_name FROM customer
      |WHERE NOT (
      |  regexp_matches(lower($custEntityNameSql), 'wireline competition bureau') OR
      |  regexp_matches(lower($custEntityNameSql), '^fcc\\b') OR
      |  regexp_matches(lower($custEntityNameSql), 'federal communications commission') OR
      |  regexp_matches(lower($custEntityNameSql), 'national telecommunications and information') OR
      |  regexp_matches(lower($custEntityNameSql), 'department of justice') OR
      |  regexp_matches(lower($custEntityNameSql), 'national association of regulatory'))""".stripMargin,

    "f9_application_type" ->
      """SELECT o_orderkey, submission_type FROM (
        |  SELECT o_orderkey,
        |    CASE o_orderkey % 4 WHEN 0 THEN 'APPLICATION FOR 214 AUTHORIZATION'
        |      WHEN 1 THEN 'COMMENT'
        |      WHEN 2 THEN 'Petition for Reconsideration'
        |      ELSE 'REQUEST FOR WAIVER' END AS submission_type
        |  FROM orders)
        |WHERE regexp_matches(upper(submission_type), 'APPLICATION|REQUEST|PETITION')""".stripMargin,

    "f10_individual_heuristic" -> s"""
      |SELECT c_custkey, $custEntityNameSql AS entity_name,
      |  (len(regexp_split_to_array(trim($custEntityNameSql), '\\s+')) <= 3
      |   AND NOT (
      |     contains(lower($custEntityNameSql), 'llc') OR
      |     contains(lower($custEntityNameSql), 'inc') OR
      |     contains(lower($custEntityNameSql), 'corp') OR
      |     contains(lower($custEntityNameSql), 'company') OR
      |     contains(lower($custEntityNameSql), 'co.') OR
      |     contains(lower($custEntityNameSql), 'communications') OR
      |     contains(lower($custEntityNameSql), 'telecom') OR
      |     contains(lower($custEntityNameSql), 'voip') OR
      |     contains(lower($custEntityNameSql), 'network') OR
      |     contains(lower($custEntityNameSql), 'services') OR
      |     contains(lower($custEntityNameSql), 'solutions'))) AS is_individual
      |FROM customer""".stripMargin,

    "f11_applicant_gate" -> s"""
      |SELECT c_custkey, entity_name, has_application FROM (
      |  SELECT c_custkey, $custEntityNameSql AS entity_name,
      |    (c_custkey % 3 = 0) AS has_application
      |  FROM customer)
      |WHERE has_application
      |  AND NOT (len(regexp_split_to_array(trim(entity_name), '\\s+')) <= 3
      |    AND NOT (
      |      contains(lower(entity_name), 'llc') OR
      |      contains(lower(entity_name), 'inc') OR
      |      contains(lower(entity_name), 'corp') OR
      |      contains(lower(entity_name), 'company') OR
      |      contains(lower(entity_name), 'co.') OR
      |      contains(lower(entity_name), 'communications') OR
      |      contains(lower(entity_name), 'telecom') OR
      |      contains(lower(entity_name), 'voip') OR
      |      contains(lower(entity_name), 'network') OR
      |      contains(lower(entity_name), 'services') OR
      |      contains(lower(entity_name), 'solutions')))
      |  AND NOT (
      |    regexp_matches(lower(entity_name), 'wireline competition bureau') OR
      |    regexp_matches(lower(entity_name), '^fcc\\b') OR
      |    regexp_matches(lower(entity_name), 'federal communications commission') OR
      |    regexp_matches(lower(entity_name), 'national telecommunications and information') OR
      |    regexp_matches(lower(entity_name), 'department of justice') OR
      |    regexp_matches(lower(entity_name), 'national association of regulatory'))""".stripMargin,

    "f13_filetype_classify" ->
      """SELECT doc_id,
        |  CASE WHEN left(content, 4) = '%PDF' THEN 'pdf'
        |       WHEN left(content, 2) = 'PK' THEN 'docx'
        |       ELSE 'bin' END AS file_type
        |FROM (
        |  SELECT doc_id,
        |    CASE doc_id % 4 WHEN 0 THEN '%PDF-1.7 stream'
        |      WHEN 1 THEN 'PK' || chr(3) || chr(4) || 'word/'
        |      ELSE text END AS content
        |  FROM documents)""".stripMargin,

    "f14_sanitize_filename" -> """
      |SELECT p_partkey,
      |  regexp_replace(
      |    substring(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace('  ' || p_name || ' <' || p_brand || '>: "file/name?"',
      |            '[<>:"/\\|?*]', '_', 'g'),
      |          '\s+', '_', 'g'),
      |        '_+', '_', 'g'),
      |      1, 80),
      |    '^_+|_+$', '', 'g') AS filename
      |FROM part""".stripMargin,

    "f15_validation_split" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_totalprice BETWEEN 2000 AND 450000 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        |  CAST(SUM(CASE WHEN o_totalprice BETWEEN 2000 AND 450000 THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    // SHA-1 replayed as a recursive CTE (DuckDB 1.0 lacks sha1()),
    // then RFC-4122 v5 version/variant bit surgery on the hex digest.
    "uuid5_company_id" -> s"""
      |WITH RECURSIVE u5src AS (
      |  SELECT p_partkey AS uid,
      |    ${IpesQueries.normChain(partEntityNameSql)} AS uname
      |  FROM part),
      |${RecursiveOracleSql.uuid5Ctes("u5src")}
      |SELECT s.uid AS p_partkey, s.uname AS normalized_name, o.u5 AS company_id
      |FROM u5src s JOIN u5_out o ON o.uid = s.uid""".stripMargin,
  )
}
