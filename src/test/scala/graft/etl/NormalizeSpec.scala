package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Reference-parity vectors for the F6–F14 operator family. Expected
  * values were captured by running the reference's own Python functions
  * (`code/structure_data.py:66-122`, `code/download_pdfs_robust.py:42-49`)
  * on these inputs.
  */
class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runNorm(names: Seq[String]): Map[String, String] =
    names.toDF("name")
      .select(col("name"), Normalize.normalizeName(col("name")).as("norm"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("F6 normalize_company_name matches reference vectors") {
    val expected = Map(
      "Stratus Networks, Inc." -> "stratus networks",
      "Stratus Network" -> "stratus network",
      "Test Telecom LLC" -> "test telecom",
      "AT&T Services, Inc." -> "at t services",
      "Acme Co. d/b/a Widgets" -> "acme",
      "John Smith" -> "john smith",
      "  Mixed   Case  L.L.C. " -> "mixed case",
      "Telnyx LLC" -> "telnyx",
      "Broadband Dynamics" -> "broadband dynamics",
      "X Corp." -> "x",
      "Vonage Holdings Corp" -> "vonage holdings",
      "A B C Limited" -> "a b c",
      "CoreTel Communications, Inc." -> "coretel communications",
      "Peerless Network, Inc." -> "peerless network",
      "" -> "",
      "Zoom Video Communications, Inc." -> "zoom video communications")
    assert(runNorm(expected.keys.toSeq) === expected)
  }

  test("F6 normalization is idempotent") {
    val names = Seq("Stratus Networks, Inc.", "AT&T Services, Inc.",
      "Acme Co. d/b/a Widgets", "X Corp.", "A B C Limited")
    val once = runNorm(names).values.toSeq
    val twice = runNorm(once)
    once.foreach(n => assert(twice(n) === n, s"not idempotent on '$n'"))
  }

  test("F10 is_likely_individual matches reference vectors") {
    val expected = Map(
      "John Smith" -> true,
      "Mary Jane Watson Parker" -> false,
      "Acme Telecom Services LLC" -> false,
      "Jo Li" -> true,
      "Bandwidth Inc" -> false,
      "T-Mobile" -> true)
    val got = expected.keys.toSeq.toDF("name")
      .select(col("name"), Normalize.isLikelyIndividual(col("name")).as("ind"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got === expected)
  }

  test("F7 should_exclude matches reference vectors") {
    val expected = Map(
      "Wireline Competition Bureau" -> true,
      "FCC" -> true,
      "fcc office of" -> true,
      "Office of FCC" -> false, // ^fcc anchor: mid-string FCC stays
      "Verizon" -> false,
      "Federal Communications Commission" -> true)
    val got = expected.keys.toSeq.toDF("name")
      .select(col("name"), Normalize.shouldExclude(col("name")).as("ex"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got === expected)
  }

  test("F9 is_application_type") {
    val expected = Map(
      "APPLICATION FOR 214 AUTHORIZATION" -> true,
      "Petition for Reconsideration" -> true,
      "REQUEST FOR WAIVER" -> true,
      "COMMENT" -> false,
      "NOTICE OF EXPARTE" -> false)
    val got = expected.keys.toSeq.toDF("t")
      .select(col("t"), Normalize.isApplicationType(col("t")).as("a"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got === expected)
  }

  test("F14 sanitize_filename caps, collapses, and strips underscores") {
    val got = Seq("Acme/Widgets: <v2>?", "  spaces   here  ", "x" * 100)
      .toDF("n").select(Normalize.sanitizeFilename(col("n")))
      .collect().map(_.getString(0))
    assert(got(0) === "Acme_Widgets_v2")
    assert(got(1) === "spaces_here")
    assert(got(2) === "x" * 80)
  }

  test("F13 magic-byte classifier on real binary prefixes") {
    val rows = Seq(
      "%PDF-1.4 rest".getBytes("UTF-8"),
      Array[Byte]('P', 'K', 3, 4, 99),
      Array(0xD0, 0xCF, 0x11, 0xE0, 0x10).map(_.toByte),
      "plain text".getBytes("UTF-8"))
    val got = rows.toDF("b")
      .select(Normalize.classifyFileType(col("b")))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(Some("pdf"), Some("docx"), Some("doc"), None))
  }
}
