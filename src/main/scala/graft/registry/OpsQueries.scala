package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Enrich
import graft.functions.OracleSafe._
import graft.ops.Skew
import graft.sources.PaginatedSource

/** Cross-cutting operator queries: the S1 paginated scan protocol, F16
  * LLM-reply validation, the salted-join skew tool (result-identical to
  * the plain join — which is exactly what its oracle asserts), and the
  * SQL-API surface over temp views.
  */
object OpsQueries extends QueryRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1: the page loop is a driver-side protocol by nature (each page
    // depends on the previous offset); the fixture stands in for the
    // remote API and the result re-distributes via createDataFrame.
    "s1_paginated_scan" -> ((s, dir) => {
      val src = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
      val api = src.collect()
      val fetch = (offset: Long, limit: Int) =>
        PaginatedSource.FetchResult(
          api.slice(offset.toInt, offset.toInt + limit).toSeq,
          Some(api.length.toLong))
      val (rows, _) = PaginatedSource.fetchAll(fetch, pageSize = 1000)
      s.createDataFrame(
        new java.util.ArrayList(scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), src.schema)
    }),

    "f16_llm_validation" -> ((s, dir) => {
      val reply = when(col("doc_id") % 3 === 0, concat(
        lit("```json{\"is_active\": true, \"activity_signal\": \"sig"),
        col("doc_id"),
        lit("\", \"industry_segment\": \"Carrier\", " +
          "\"product_summary\": \"p\", \"market_position\": \"SMB\"}```")))
        .when(col("doc_id") % 3 === 1, lit("{\"is_active\": false}"))
        .otherwise(lit("not json at all"))
      val parsed = Enrich.parseLlmReply(reply)
      Tables.documents(s, dir).select(
        col("doc_id"),
        parsed.getField("is_active").as("is_active"),
        parsed.getField("activity_signal").as("activity_signal"),
        parsed.getField("industry_segment").as("industry_segment"),
        parsed.isNotNull.as("valid"))
    }),

    "skew_salted_join" -> ((s, dir) =>
      Skew.saltedEquiJoin(
        Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity")),
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
        "l_orderkey", "o_orderkey", salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"), decSum(col("l_quantity")).as("qty"))),

    // S1 scale path: DataSourceV2 offset-ranged parallel scan of the
    // deterministic API fixture, aggregated per page. The fixture size
    // is DERIVED from the corpus (orders row count — a parquet-footer
    // metadata read), not pinned: at a 100× replica the scan really
    // pages through 100× the offsets, so the scale record exercises
    // the source's partition planning instead of a fixed 20k rows.
    "s1_dsv2_scan" -> ((s, dir) => {
      val n = Tables.orders(s, dir).count()
      s.read.format("graft.sources.v2.FilingsApiSource")
        .option("total", n).option("pageSize", 1000).load()
        .groupBy(col("page"), col("submission_type"))
        .agg(count(lit(1)).as("n_rows"), decSum(col("amount")).as("amount_sum"))
    }),

    // range join: events against 1-hour windows anchored at every 20th
    // event, bucketized into an equi-join; oracle is the plain
    // inequality join.
    "range_join" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      val intervals = e.filter(col("event_id") % 20 === 0)
        .select(col("event_id").as("interval_id"), col("us").as("start"),
          (col("us") + 3600L * 1000000L).as("end"))
      graft.ops.RangeJoin.bucketed(
          e.select(col("event_id"), col("us"), col("value")), intervals,
          "us", "start", "end", width = 600L * 1000000L)
        .groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n_points"), decSum(col("value")).as("total_value"))
    }),

    // The same per-interval aggregate WITHOUT enumerating matches:
    // multi-resolution bucket decomposition (10 s fine × 60 = 600 s
    // coarse). The range-JOIN form's cost is |matches| — ~7 BILLION
    // pairs at the 100× events replica for a 500k-row answer; this
    // touches point rows only in the ≤2 partial edge buckets per
    // interval. Decimal-exact partials ⇒ bit-identical to the join
    // form, so the SAME inequality-join DuckDB twin verifies both.
    "range_agg_multires" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(
        col("event_id"), unix_micros(col("ts")).as("us"), col("value"))
      val intervals = e.filter(col("event_id") % 20 === 0)
        .select(col("event_id").as("interval_id"), col("us").as("start"),
          (col("us") + 3600L * 1000000L).as("end"))
      graft.ops.RangeJoin.intervalAggregate(
        e.select(col("us"), col("value")), intervals,
        "us", "value", "interval_id", "start", "end",
        fine = 10L * 1000000L, factor = 60)
    }),

    // as-of join: attach the latest point-in-time snapshot (every 10th
    // event) to each event without leakage; oracle is DuckDB's native
    // ASOF JOIN. Micros-precision BIGINT keys avoid the ns/us gap.
    "asof_join" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      val snaps = e.filter(col("event_id") % 10 === 0)
        .groupBy(col("user_id"), col("us"))
        .agg(min(col("value")).as("snap_value"))
      graft.ops.AsOf.asofJoin(
        e.select("event_id", "user_id", "us"), snaps,
        key = "user_id", tsCol = "us", payloadCols = Seq("snap_value"))
    }),

    "sql_dashboard" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      s.sql("""SELECT c_mktsegment, COUNT(*) AS n,
              |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
              |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
              |GROUP BY c_mktsegment""".stripMargin)
    }),
  )

  def oracle: Map[String, String] = Map(
    "s1_paginated_scan" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders",

    "f16_llm_validation" -> """
      |WITH r AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3
      |      WHEN 0 THEN '```json{"is_active": true, "activity_signal": "sig' || doc_id ||
      |        '", "industry_segment": "Carrier", "product_summary": "p", "market_position": "SMB"}```'
      |      WHEN 1 THEN '{"is_active": false}'
      |      ELSE 'not json at all' END AS reply
      |  FROM documents),
      |c0 AS (SELECT doc_id, regexp_replace(reply, '```(json)?', '', 'g') AS j0 FROM r),
      |c AS (SELECT doc_id, CASE WHEN json_valid(j0) THEN j0 END AS j FROM c0),
      |v AS (SELECT doc_id, j,
      |  (j IS NOT NULL
      |    AND json_extract_string(j, '$.is_active') IS NOT NULL
      |    AND json_extract_string(j, '$.activity_signal') IS NOT NULL
      |    AND json_extract_string(j, '$.industry_segment') IS NOT NULL
      |    AND json_extract_string(j, '$.product_summary') IS NOT NULL
      |    AND json_extract_string(j, '$.market_position') IS NOT NULL) AS ok
      |  FROM c)
      |SELECT doc_id,
      |  CASE WHEN ok THEN CAST(json_extract_string(j, '$.is_active') AS BOOLEAN) END AS is_active,
      |  CASE WHEN ok THEN json_extract_string(j, '$.activity_signal') END AS activity_signal,
      |  CASE WHEN ok THEN json_extract_string(j, '$.industry_segment') END AS industry_segment,
      |  ok AS valid
      |FROM v""".stripMargin,

    "skew_salted_join" -> """
      |SELECT o_orderpriority, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin,

    "s1_dsv2_scan" -> """
      |WITH api AS (
      |  SELECT i,
      |    CAST(i // 1000 AS INT) AS page,
      |    CASE i % 4 WHEN 0 THEN 'APPLICATION' WHEN 1 THEN 'COMMENT'
      |      WHEN 2 THEN 'PETITION' ELSE 'REQUEST' END AS submission_type,
      |    (i % 1000) / 10.0 AS amount
      |  FROM (SELECT row_number() OVER () - 1 AS i FROM orders) t)
      |SELECT page, submission_type, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS amount_sum
      |FROM api GROUP BY page, submission_type""".stripMargin,

    "range_join" -> """
      |WITH e AS (SELECT event_id, epoch_us(ts) AS us, value FROM events),
      |iv AS (
      |  SELECT event_id AS interval_id, us AS s, us + 3600000000 AS e2
      |  FROM e WHERE event_id % 20 = 0)
      |SELECT interval_id, COUNT(*) AS n_points,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM e JOIN iv ON e.us BETWEEN iv.s AND iv.e2
      |GROUP BY interval_id""".stripMargin,

    // identical answer contract to range_join — one inequality-join
    // twin verifies both the enumerating and the multi-resolution form
    "range_agg_multires" -> """
      |WITH e AS (SELECT event_id, epoch_us(ts) AS us, value FROM events),
      |iv AS (
      |  SELECT event_id AS interval_id, us AS s, us + 3600000000 AS e2
      |  FROM e WHERE event_id % 20 = 0)
      |SELECT interval_id, COUNT(*) AS n_points,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM e JOIN iv ON e.us BETWEEN iv.s AND iv.e2
      |GROUP BY interval_id""".stripMargin,

    "asof_join" -> """
      |WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events),
      |snap AS (
      |  SELECT user_id, us, MIN(value) AS snap_value
      |  FROM e WHERE event_id % 10 = 0 GROUP BY user_id, us)
      |SELECT e.event_id, e.user_id, e.us, snap.snap_value
      |FROM e ASOF LEFT JOIN snap
      |  ON e.user_id = snap.user_id AND e.us >= snap.us""".stripMargin,

    "sql_dashboard" -> """
      |SELECT c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin,
  )
}
