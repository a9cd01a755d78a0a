package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.OracleSafe._

/** The reference's dashboard analytics family re-expressed Spark-first.
  *
  * Mirrors `dashboard/pages/3_📈_Data_Insights.py` in the reference
  * (star join :25-32, metrics :49-53, monthly trend :63-66, top-k
  * :73-102, sorted table :111-112) over the driver's star schema
  * (orders ≈ filings fact, customer ≈ companies dim).
  *
  * Scale notes: the dimension side of the star join is broadcast —
  * at 100 TB the fact table never shuffles for this join. All
  * aggregations are partial-aggregate friendly (map-side combine), and
  * top-k is computed as a full aggregate then a tiny sorted limit (the
  * aggregate output is |distinct keys|, not |rows|).
  */
object Dashboard {

  /** J1: fact ⋈ dim broadcast-hash star join. */
  def starJoin(orders: DataFrame, customer: DataFrame): DataFrame =
    orders.join(broadcast(customer),
      orders("o_custkey") === customer("c_custkey"), "inner")

  /** Revenue/count rollup per market segment over the star join. */
  def segmentSummary(orders: DataFrame, customer: DataFrame): DataFrame =
    starJoin(orders, customer)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("order_cnt"),
        decSum(col("o_totalprice")).as("revenue"),
        countDistinct(col("o_custkey")).as("n_customers"))

  /** A11: month-bucketed counts (the dashboard's filing trend). */
  def monthlyTrend(orders: DataFrame): DataFrame =
    orders
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        decSum(col("o_totalprice")).as("revenue"))

  /** A12/W4: deterministic top-k frequency table (count desc, key asc). */
  def topK(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(k)

  /** A7–A10: single-row headline metrics (total, distinct, mode, max).
    * Mode is made deterministic by tie-breaking on the value itself —
    * the reference's pandas `.mode()[0]` has the same smallest-value
    * semantics. The mode sub-result is attached with a LEFT join: on
    * empty input the aggregate still emits its one row (count 0, null
    * max) with a null top_priority, matching SQL semantics — a cross
    * join would drop the row entirely.
    */
  def headlineMetrics(orders: DataFrame): DataFrame = {
    val mode = orders
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("o_orderpriority").asc)
      .limit(1)
      .select(col("o_orderpriority").as("top_priority"))
    orders
      .agg(
        count(lit(1)).as("total_orders"),
        countDistinct(col("o_custkey")).as("distinct_customers"),
        max(col("o_orderdate")).cast("date").as("latest_order_date"))
      .join(mode, lit(true), "left")
  }
}
