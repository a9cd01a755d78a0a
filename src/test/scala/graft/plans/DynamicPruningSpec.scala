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

  test("DPP composes with the z-order in-partition layout: dir pruning then file pruning") {
    // The 100 TB layout: hive dirs on the coarse join key (pruned at
    // RUNTIME by the dim filter via DPP) and a Morton curve within
    // each dir (pruned by parquet min/max under per-key predicates).
    // Asserts both layers on ONE dataset: the executed fact scan's
    // numFiles metric equals the surviving directory's file count
    // (DPP), and within it a custkey predicate touches only the
    // narrow z-boxes (stats pruning).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false") // plain plan → readable scan metrics
    val base = java.nio.file.Files.createTempDirectory("graft_dppz").toString
    val (factDir, dimDir) = (s"$base/fact", s"$base/dim")
    try {
      val fact = Tables.orders(s2, "/root/testdata/sf0.01")
        .select(col("o_orderpriority"), col("o_custkey"), col("o_orderkey"))
      // ~64 files per priority dir: enough curve granularity for the
      // z-boxes to stay narrow per dimension (see ZOrderSpec — at a
      // handful of files every layout's boxes are coarse)
      graft.operators.ZOrder
        .layoutWithin(fact, "o_orderpriority", "o_custkey", "o_orderkey", 325)
        .write.partitionBy("o_orderpriority").parquet(factDir)
      import s2.implicits._
      Seq(("1-URGENT", "keep"), ("2-HIGH", "drop"), ("3-MEDIUM", "drop"))
        .toDF("o_orderpriority", "tag")
        .write.mode("overwrite").parquet(dimDir)
      val joined = s2.read.parquet(factDir)
        .join(s2.read.parquet(dimDir).filter(col("tag") === "keep"), "o_orderpriority")
      joined.collect() // execute so the scan metrics fill

      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.toLowerCase.contains("dynamicpruning"), s"no DPP:\n$planStr")

      def filesUnder(p: String): Long = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
          .count(_.toString.endsWith(".parquet"))
      }
      val factScan = joined.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.partitionFilters.nonEmpty => f
      }.head
      val opened = factScan.metrics("numFiles").value
      val urgentFiles = filesUnder(s"$factDir/o_orderpriority=1-URGENT")
      val totalFiles = filesUnder(factDir)
      assert(opened === urgentFiles && opened < totalFiles,
        s"DPP opened $opened files; dir has $urgentFiles of $totalFiles total")

      // second layer: a custkey predicate inside the surviving dir
      // must touch only the files whose z-boxes cover the range
      // (input_file_name() needs a single source — read the fact
      // directly with the same static dir + key slice)
      val touched = s2.read.parquet(factDir)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_custkey").between(600L, 787L))
        .withColumn("f", input_file_name())
        .select(col("f")).distinct().count()
      assert(touched * 2 <= urgentFiles,
        s"z-boxes: custkey slice touches $touched of $urgentFiles files")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
  }
}
