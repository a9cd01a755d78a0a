package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join is row-identical to the plain inner join under skew") {
    // hot key: 90% of left rows share key 1
    val left = (1 to 1000).map(i => (if (i % 10 == 0) i.toLong else 1L, i))
      .toDF("k", "v")
    val right = (1L to 100L).map(k => (k, s"r$k")).toDF("rk", "label")
    val plain = left.join(right, left("k") === right("rk"))
      .select("k", "v", "label").collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedEquiJoin(left, right, "k", "rk", salts = 8)
      .select("k", "v", "label").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length === plain.length)
    assert(salted === plain)
  }
}
