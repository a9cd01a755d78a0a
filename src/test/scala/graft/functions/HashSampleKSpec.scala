package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The hash-sample aggregate must equal the brute-force bottom-k under
  * any partitioning (the merge path), keep duplicates as a multiset,
  * and bound its state at k entries.
  */
class HashSampleKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(values: Seq[String], k: Int): Seq[String] =
    values.map(v => (HashSampleK.md5Hex(v), v)).sorted.take(k).map(_._2)

  test("equals brute-force bottom-k-by-md5 under different partitionings") {
    val values = (1 to 97).map(i => s"name_$i") ++ Seq("dup", "dup", "dup")
    val expected = brute(values, 7)
    for (parts <- Seq(1, 4, 13)) {
      val got = values.toDF("v").repartition(parts)
        .agg(GraftFunctions.sampleK(col("v"), 7).as("s"))
        .collect()(0).getSeq[String](0)
      assert(got === expected, s"parts=$parts")
    }
  }

  test("per-group sampling: small groups return everything, in hash order") {
    val df = Seq(("a", "x"), ("a", "y"), ("b", "z")).toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(GraftFunctions.sampleK(col("v"), 5).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("a") === brute(Seq("x", "y"), 5))
    assert(got("b") === Seq("z"))
  }

  test("nulls are skipped; empty input yields an empty array") {
    val df = Seq(Some("x"), None, Some("y")).toDF("v")
    val got = df.agg(GraftFunctions.sampleK(col("v"), 3)).collect()(0).getSeq[String](0)
    assert(got === brute(Seq("x", "y"), 3))
    val empty = Seq.empty[String].toDF("v")
      .agg(GraftFunctions.sampleK(col("v"), 3)).collect()(0).getSeq[String](0)
    assert(empty === Seq.empty)
  }
}
