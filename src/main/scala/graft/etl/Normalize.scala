package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Name-normalization and predicate family (SURVEY §2.2 F6–F14).
  *
  * Every function here is a pure `Column` expression chain — no UDFs —
  * so Catalyst folds them into whole-stage codegen and they push down /
  * prune like any built-in. Semantics mirror the reference:
  *   - normalize_company_name  `code/structure_data.py:66-87`
  *   - should_exclude          `code/structure_data.py:56-63,90-96`
  *   - is_application_type     `code/structure_data.py:99-102`
  *   - is_likely_individual    `code/structure_data.py:105-115`
  *   - sanitize_filename       `code/download_pdfs_robust.py:42-49`
  *   - magic-byte file typing  `code/download_pdfs_robust.py:112-124`
  */
object Normalize {

  /** Blocklist of non-company entities (ref structure_data.py:56-63). */
  val ExcludePatterns: Seq[String] = Seq(
    "wireline competition bureau",
    "^fcc\\b",
    "federal communications commission",
    "national telecommunications and information",
    "department of justice",
    "national association of regulatory")

  private val BusinessIndicators: Seq[String] = Seq(
    "llc", "inc", "corp", "company", "co.", "communications",
    "telecom", "voip", "network", "services", "solutions")

  /** F6: lower/trim → strip legal suffixes (3 regex groups) → strip
    * d/b/a tail → punctuation to space → collapse whitespace.
    */
  def normalizeName(c: Column): Column = {
    val lowered = trim(lower(coalesce(c, lit(""))))
    val s1 = regexp_replace(lowered,
      "(?i)\\b(llc|l\\.l\\.c\\.?|inc\\.?|incorporated|corp\\.?|corporation|co\\.?|company)\\b", "")
    val s2 = regexp_replace(s1, "(?i)\\b(ltd\\.?|limited|lp|l\\.p\\.?|llp|l\\.l\\.p\\.?)\\b", "")
    val s3 = regexp_replace(s2, "(?i)\\b(pllc|p\\.l\\.l\\.c\\.?|pc|p\\.c\\.?)\\b", "")
    val s4 = regexp_replace(s3, "(?i),?\\s*(d/?b/?a|doing business as)\\s+.*$", "")
    val s5 = regexp_replace(s4, "[^\\w\\s]", " ")
    trim(regexp_replace(s5, "\\s+", " "))
  }

  /** F7: entity matches any blocklist regex. One alternation regex, not
    * six rlike passes — same semantics, ~6× less regex work per row
    * (this sits on the hot filter path of every pipeline run).
    */
  def shouldExclude(c: Column): Column =
    lower(coalesce(c, lit(""))).rlike(ExcludePatterns.mkString("(", ")|(", ")"))

  /** F9: submission type contains APPLICATION / REQUEST / PETITION. */
  def isApplicationType(c: Column): Column =
    upper(coalesce(c, lit(""))).rlike("APPLICATION|REQUEST|PETITION")

  /** F10: ≤3 whitespace tokens and no business keyword ⇒ individual.
    * Keyword test is substring containment, matching the reference.
    */
  def isLikelyIndividual(name: Column): Column = {
    // one alternation of literal substrings == the reference's
    // any(contains) over the indicator list
    val hasBusinessWord = lower(coalesce(name, lit("")))
      .rlike(BusinessIndicators.map(java.util.regex.Pattern.quote).mkString("|"))
    (size(split(trim(coalesce(name, lit(""))), "\\s+")) <= 3) && !hasBusinessWord
  }

  /** F8: IPES relevance — description mentions voip/52.15 or docket is
    * the INBOX-52.15 queue (ref structure_data.py:134-146).
    */
  def isRelevant(description: Column, docket: Column): Column =
    lower(coalesce(description, lit(""))).contains("voip") ||
      lower(coalesce(description, lit(""))).contains("52.15") ||
      lower(coalesce(docket, lit(""))).contains("inbox-52.15")

  /** F14: forbidden chars → `_`, whitespace runs → `_`, collapse `_`
    * runs, cap 80, trim leading/trailing `_`.
    */
  def sanitizeFilename(c: Column): Column = {
    val s1 = regexp_replace(coalesce(c, lit("")), "[<>:\"/\\\\|?*]", "_")
    val s2 = regexp_replace(s1, "\\s+", "_")
    val s3 = regexp_replace(s2, "_+", "_")
    regexp_replace(substring(s3, 1, 80), "^_+|_+$", "")
  }

  /** F13: magic-byte file-type classifier over a binary column.
    * `%PDF` → pdf, `PK` → docx, D0 CF 11 E0 (OLE2) → doc, else null
    * (caller keeps the existing suffix).
    */
  def classifyFileType(bin: Column): Column =
    when(substring(bin, 1, 4) === lit("%PDF".getBytes("UTF-8")), "pdf")
      .when(substring(bin, 1, 2) === lit("PK".getBytes("UTF-8")), "docx")
      .when(substring(bin, 1, 4) === lit(Array(0xD0, 0xCF, 0x11, 0xE0).map(_.toByte)), "doc")
      .otherwise(lit(null).cast("string"))
}
