package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.IpesSchemas

/** S3/S4/S6/S7/S8 roundtrips + tolerant-read behavior. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  test("S3 jsonArray: reads whole-file arrays; corrupt rows land in _corrupt_record") {
    val dir = tmp("json")
    val f = new java.io.File(dir, "data.json")
    val good = """[{"submission_id":"1","company_name":"Acme LLC","date_received":"2024-01-01",
      |"submission_type":"APPLICATION","docket_number":"INBOX-52.15",
      |"proceeding_description":"VoIP","bureau":"","filing_status":"DISSEMINATED",
      |"contact_attorney":"","law_firm":"","document_urls":"","detail_url":""}]""".stripMargin
    Files.writeString(f.toPath, good)
    // cache first: Spark refuses raw-file queries that reference only
    // the internal corrupt-record column
    val df = Readers.jsonArray(spark, IpesSchemas.bronze, f.toString).cache()
    assert(df.count() === 1)
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 0)
    assert(df.select("company_name").collect()(0).getString(0) === "Acme LLC")
  }

  test("S3 jsonArray ingests the reference's real monitoring artifacts") {
    // the reference ships whole-file JSON arrays with nested structs
    // (run_stats.json: validation_report + outputs map) — the actual
    // artifact its Monitoring page loads, not a synthetic fixture.
    import org.apache.spark.sql.types._
    val runSchema = StructType(Seq(
      StructField("status", StringType),
      StructField("timestamp", StringType),
      StructField("total_duration_seconds", DoubleType),
      StructField("validation_report", StructType(Seq(
        StructField("timestamp", StringType),
        StructField("total_processed", LongType),
        StructField("valid_records", LongType),
        StructField("invalid_records", LongType),
        StructField("error_samples", ArrayType(StringType))))),
      StructField("outputs", MapType(StringType, StringType))))
    val runs = Readers.jsonArray(spark,
      runSchema, "/root/reference/data/monitoring/run_stats.json").cache()
    assert(runs.count() === 6)
    assert(runs.filter(col("_corrupt_record").isNotNull).count() === 0)
    // nested fields parse: every run validated 178 records, 0 invalid
    val reports = runs.select("validation_report.total_processed",
      "validation_report.invalid_records").collect()
    assert(reports.forall(r => r.getLong(0) === 178L && r.getLong(1) === 0L))
    // W5 read-back: latest run by timestamp is a success
    val latest = runs.orderBy(col("timestamp").desc).limit(1).collect()(0)
    assert(latest.getAs[String]("status") === "success")

    val valSchema = StructType(Seq(
      StructField("timestamp", StringType),
      StructField("total_processed", LongType),
      StructField("valid_records", LongType),
      StructField("invalid_records", LongType),
      StructField("error_samples", ArrayType(StringType))))
    val vals = Readers.jsonArray(spark,
      valSchema, "/root/reference/data/monitoring/validation_stats.json").cache()
    assert(vals.count() > 0)
    assert(vals.filter(col("_corrupt_record").isNotNull).count() === 0)
  }

  test("S6/S7 roundtrip: csv with fixed column order, json lines") {
    val dir = tmp("rt")
    val df = Seq(("a", 1L, "2024-01-01"), ("b", 2L, "2024-02-01"))
      .toDF("entity_name", "filing_count", "latest_filing_date")
    Writers.csvOrdered(df, Seq("entity_name", "filing_count", "latest_filing_date"), s"$dir/csv")
    Writers.json(df, s"$dir/json")
    val backCsv = Readers.csv(spark, df.schema, s"$dir/csv")
    assert(backCsv.orderBy("entity_name").collect().map(_.toSeq).toSeq ===
      df.orderBy("entity_name").collect().map(_.toSeq).toSeq)
    val backJson = spark.read.schema(df.schema).json(s"$dir/json")
    assert(backJson.count() === 2)
  }

  test("S8 append-history: runs accumulate, latest-run query (W5) reads newest") {
    val dir = tmp("hist")
    val r1 = Seq((3L, 0L)).toDF("valid_records", "invalid_records")
    val r2 = Seq((5L, 1L)).toDF("valid_records", "invalid_records")
    Writers.appendHistory(r1, dir, "2024-01-01T00:00:00")
    Writers.appendHistory(r2, dir, "2024-01-02T00:00:00")
    val hist = spark.read.parquet(dir)
    assert(hist.count() === 2)
    val latest = hist.orderBy(col("run_ts").desc).limit(1).collect()(0)
    assert(latest.getAs[Long]("valid_records") === 5L)
  }

  test("partitioned layout: partition-column filters prune at the scan") {
    val dir = tmp("prune") + "/docs"
    Seq((1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c"), (4L, "fr", "d"))
      .toDF("doc_id", "lang", "text")
      .repartition(col("lang"))
      .write.partitionBy("lang").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
    // the lang predicate must resolve against the directory layout, not
    // row data: the scan's partition filters carry it and the data
    // filters stay empty
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("lang"), scan)
    assert(q.count() === 2)
    // only the en=... directory is listed in the scan's selected files
    assert(q.select("doc_id").collect().map(_.getLong(0)).sorted === Array(1L, 2L))
  }

  test("packList/unpackList edge serialization roundtrip") {
    val df = Seq(Seq("u1", "u2"), Seq("solo"), Seq.empty[String])
      .toDF("urls")
      .withColumn("packed", Writers.packList(col("urls")))
      .withColumn("back", Writers.unpackList(col("packed")))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](2))
    }
  }

  test("range-partitioned write yields non-overlapping sorted files") {
    val out = tmp("range") + "/orders"
    graft.Tables.orders(spark, TestSpark.SfDir)
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .write.parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1, "need multiple files to prove range layout")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("o_orderkey")), max(col("o_orderkey"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi < lo, s"file key ranges overlap: $ranges")
      case _ =>
    }
  }

  test("bucketed tables sort-merge join without any runtime exchange") {
    val p = tmp("bucket")
    spark.sql("DROP TABLE IF EXISTS spec_b_orders")
    spark.sql("DROP TABLE IF EXISTS spec_b_lineitem")
    graft.Tables.orders(spark, TestSpark.SfDir)
      .select("o_orderkey", "o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$p/o").saveAsTable("spec_b_orders")
    graft.Tables.lineitem(spark, TestSpark.SfDir)
      .select("l_orderkey", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$p/l").saveAsTable("spec_b_lineitem")
    val joined = spark.table("spec_b_lineitem").hint("merge")
      .join(spark.table("spec_b_orders").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    // the whole point of bucketing: the write pre-shuffled both sides,
    // so the join itself plans exchange-free
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() ===
      graft.Tables.lineitem(spark, TestSpark.SfDir).count())
  }
}
