package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.analytics.Dashboard
import graft.functions.OracleSafe._

/** Dashboard analytics family: star join J1, metrics A7–A10, monthly
  * trend A11, top-k A12, plus the TPC-H-Q1-style pricing rollup that
  * stands in for the reference's per-group filing aggregates (A2/A5).
  */
object AnalyticsQueries extends QueryRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
            .cast("double").as("sum_disc_price"),
          decAvg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))),

    "j1_star_join" -> ((s, dir) =>
      Dashboard.segmentSummary(Tables.orders(s, dir), Tables.customer(s, dir))),

    "a11_monthly_trend" -> ((s, dir) =>
      Dashboard.monthlyTrend(Tables.orders(s, dir))),

    "a12_topk_priority" -> ((s, dir) =>
      Dashboard.topK(Tables.orders(s, dir), "o_orderpriority", 7)),

    "a7_headline_metrics" -> ((s, dir) =>
      Dashboard.headlineMetrics(Tables.orders(s, dir))),
  )

  def oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "j1_star_join" ->
      """SELECT c_mktsegment,
        |  COUNT(*) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_custkey) AS n_customers
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "a11_monthly_trend" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1""".stripMargin,

    "a12_topk_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt
        |FROM orders GROUP BY 1
        |ORDER BY cnt DESC, o_orderpriority LIMIT 7""".stripMargin,

    "a7_headline_metrics" ->
      """SELECT COUNT(*) AS total_orders,
        |  COUNT(DISTINCT o_custkey) AS distinct_customers,
        |  CAST(MAX(o_orderdate) AS DATE) AS latest_order_date,
        |  (SELECT o_orderpriority FROM orders GROUP BY o_orderpriority
        |   ORDER BY COUNT(*) DESC, o_orderpriority LIMIT 1) AS top_priority
        |FROM orders""".stripMargin,
  )
}
