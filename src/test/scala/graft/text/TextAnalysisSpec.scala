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

  test("sharded packing: window partitions by the shard key and replays per-shard greedy") {
    val docs = graft.Tables.documents(spark, TestSpark.SfDir)
    val packed = TextAnalysis.packBinsSharded(docs, "doc_id", "lang", "text",
      tokenBudget = 500, shardRows = 50)
    // the plan must partition the window by BOTH lang and shard — one
    // task per shard is the whole point (a bare-lang partition is the
    // scale-killer this operator replaces)
    val plan = packed.queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(lang"), plan)
    assert(plan.replaceAll("\\s", "").contains("lang#") &&
      plan.contains("shard"), s"window not partitioned by (lang, shard):\n$plan")

    val rows = packed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // bins never span shards: replay the greedy prefix sum per
    // (lang, shard) group on the driver and require exact agreement
    rows.groupBy(t => (t._2, t._4)).foreach { case ((lang, shard), grp) =>
      var cum = 0L
      grp.sortBy(_._1).foreach { case (id, _, ntok, _, bin) =>
        assert(bin === cum / 500, s"doc $id in ($lang, $shard)")
        cum += ntok
      }
    }
    // shard assignment is the id-range rule
    rows.foreach { case (id, _, _, shard, _) => assert(shard === id / 50) }
  }
}
