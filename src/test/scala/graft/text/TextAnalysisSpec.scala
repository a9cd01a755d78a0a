package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("winnowing: shared substrings of >= n+w-1 tokens share a fingerprint") {
    val common = "alpha beta gamma delta epsilon zeta eta theta"
    val a = s"prefix one two $common suffix here"
    val b = s"$common totally different tail words now"
    val fps = Seq(("a", a), ("b", b), ("c", "unrelated words entirely distinct tokens"))
      .toDF("id", "t")
      .select(col("id"), TextAnalysis.winnowFingerprints(col("t")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps("a").intersect(fps("b")).nonEmpty, "8-token overlap must share a print")
    assert(fps("a").intersect(fps("c")).isEmpty)
  }

  test("winnowing keeps far fewer hashes than raw shingling") {
    val doc = (1 to 200).map(i => s"tok$i").mkString(" ")
    val row = Seq(doc).toDF("t").select(
      size(TextAnalysis.shingles(col("t"), 3)).as("n_shingles"),
      size(TextAnalysis.winnowFingerprints(col("t"))).as("n_prints"))
      .collect()(0)
    val (shingles, prints) = (row.getInt(0), row.getInt(1))
    assert(prints < shingles / 2, s"$prints vs $shingles")
    assert(prints > 0)
  }

  test("langId picks the language whose stopwords dominate") {
    val got = Seq(
      "the cat and the dog in the house",
      "el perro y la casa de un gato",
      "der hund und die katze ist von zu",
      "no stopwords whatsoever here")
      .toDF("t").select(TextAnalysis.langId(col("t")))
      .collect().map(_.getString(0))
    assert(got.toSeq === Seq("en", "es", "de", "und"))
  }

  test("quality score stays in [0,1] and rewards stopword-bearing prose") {
    val rows = Seq(
      "the quick brown fox jumps over the lazy dog and runs for the hills",
      "zzzz qqqq 1234 @@@@")
      .toDF("t").select(TextAnalysis.qualityScore(col("t")))
      .collect().map(_.getDouble(0))
    rows.foreach(s => assert(s >= 0.0 && s <= 1.0))
    assert(rows(0) > rows(1))
  }
}
