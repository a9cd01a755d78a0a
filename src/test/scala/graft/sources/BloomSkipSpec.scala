package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BloomSkip must be row-for-row identical to the plain LEFT ANTI
  * join under every regime that can distinguish them: overlapping and
  * disjoint key sets, an empty manifest, null queue keys (an anti-join
  * KEEPS a null-keyed probe row — null equals nothing), and an
  * under-sized filter whose false positives flood the suspect branch.
  */
class BloomSkipSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def antiJoin(queue: org.apache.spark.sql.DataFrame,
                       existing: org.apache.spark.sql.DataFrame) =
    queue.join(existing.select(col("k")), Seq("k"), "left_anti")
      .select(queue.columns.map(col).toSeq: _*)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("matches the plain anti-join on overlapping key sets") {
    val queue = (1 to 500).map(i => (s"key_$i", i)).toDF("k", "v")
    val existing = (1 to 500 by 3).map(i => s"key_$i").toDF("k")
    val got = BloomSkip.skipExisting(queue, existing, "k")
    assert(canon(got) === canon(antiJoin(queue, existing)))
    assert(got.count() === 500 - (1 to 500 by 3).size)
  }

  test("empty manifest passes the whole queue through") {
    val queue = (1 to 50).map(i => (s"key_$i", i)).toDF("k", "v")
    val existing = Seq.empty[String].toDF("k")
    assert(BloomSkip.skipExisting(queue, existing, "k").count() === 50)
  }

  test("null queue keys survive, exactly as the anti-join keeps them") {
    val queue = Seq(("a", 1), (null, 2), ("b", 3), (null, 4))
      .toDF("k", "v")
    // One manifest WITH a null (never matches anything under join
    // semantics) and one without: both must keep the null queue rows.
    for (manifest <- Seq(Seq("a", null), Seq("a"))) {
      val existing = manifest.toDF("k")
      val got = BloomSkip.skipExisting(queue, existing, "k")
      assert(canon(got) === canon(antiJoin(queue, existing)))
      assert(got.filter(col("k").isNull).count() === 2)
    }
  }

  test("stays exact when a deliberately under-sized filter floods the suspect branch") {
    val queue = (1 to 2000).map(i => (s"key_$i", i)).toDF("k", "v")
    val existing = (1 to 2000 by 7).map(i => s"key_$i").toDF("k")
    // 64 bits for 286 keys: essentially every probe is a suspect.
    val got = BloomSkip.skipExisting(queue, existing, "k", maxNumBits = 64)
    assert(canon(got) === canon(antiJoin(queue, existing)))
  }

  test("the filter actually splits: non-members mostly bypass, members always suspect") {
    val existing = (1 to 1000).map(i => s"key_$i").toDF("k")
    val bytes = BloomSkip.bloomBytesOf(existing, "k", fpp = 0.01)
    val members = (1 to 1000).map(i => s"key_$i").toDF("k")
      .where(BloomSkip.mightContain(bytes, col("k"))).count()
    assert(members === 1000, "a Bloom filter must never miss a member")
    val strangers = (1 to 1000).map(i => s"other_$i").toDF("k")
      .where(BloomSkip.mightContain(bytes, col("k"))).count()
    assert(strangers < 100,
      s"fpp=0.01 sizing should pass ~10 of 1000 strangers, saw $strangers")
  }
}
