package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Dynamic partition pruning proof: when the fact table is laid out by
  * the join key and the dim side carries a selective filter, Catalyst
  * must inject a runtime subquery filter so the fact scan opens only
  * the matching partitions. At 100 TB this is the difference between
  * scanning one priority class and scanning the whole fact table —
  * the layout contract (partitionBy on the hot join/filter key) is as
  * load-bearing as the query itself.
  */
class DynamicPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dim-filtered join on the partition key plans a dynamic pruning subquery") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    try {
      val fact = Tables.orders(spark, TestSpark.SfDir)
      fact.write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
      val pf = spark.read.parquet(dir)
      import spark.implicits._
      // the dim must be a real datasource scan: a local relation's
      // filter constant-folds away and DPP sees no selective predicate
      Seq(("1-URGENT", "keep"), ("2-HIGH", "drop"), ("3-MEDIUM", "drop"))
        .toDF("o_orderpriority", "tag")
        .write.mode("overwrite").parquet(s"$dir-dim")
      val dim = spark.read.parquet(s"$dir-dim")
      val joined = pf.join(dim.filter(col("tag") === "keep"), "o_orderpriority")

      // results equal the static-filter plan
      val expected = fact.filter(col("o_orderpriority") === "1-URGENT").count()
      assert(joined.count() == expected)

      // the (final, post-AQE) fact scan carries a dynamicpruning
      // partition filter fed from the broadcast dim
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"), s"no DPP in plan:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$dir-dim"))
    }
  }
}
