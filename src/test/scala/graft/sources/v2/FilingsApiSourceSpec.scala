package graft.sources.v2

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FilingsApiSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def load(total: Int, pageSize: Int) =
    spark.read.format("graft.sources.v2.FilingsApiSource")
      .option("total", total).option("pageSize", pageSize).load()

  test("offset-ranged partitions cover the record space exactly once") {
    val df = load(2500, 1000)
    assert(df.rdd.getNumPartitions === 3) // 1000 + 1000 + 500
    assert(df.count() === 2500)
    assert(df.select(countDistinct(col("submission_id"))).collect()(0).getLong(0) === 2500)
  }

  test("records are the closed-form function of the index") {
    val row = load(100, 10).filter(col("submission_id") === "SUB-42").collect()(0)
    assert(row.getAs[Int]("page") === 4)
    assert(row.getAs[String]("submission_type") === "PETITION") // 42 % 4 == 2
    assert(row.getAs[String]("docket_number") === "INBOX-52.15") // 42 % 3 == 0
    assert(row.getAs[Double]("amount") === 4.2)
  }

  test("short final page and exact-multiple totals") {
    assert(load(1000, 250).rdd.getNumPartitions === 4)
    assert(load(1001, 250).rdd.getNumPartitions === 5)
    assert(load(1001, 250).count() === 1001)
  }
}
