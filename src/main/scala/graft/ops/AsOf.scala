package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row
  * with the same key and `rightTs <= leftTs` — the join a
  * training-data pipeline needs to attach slowly-changing metadata
  * (model version, account snapshot) to events without leakage.
  *
  * Spark has no native as-of join; rather than a custom SparkPlan,
  * this composes built-ins (preference order (a)): tag and union both
  * sides, one window sorted by (ts, side) per key carrying the last
  * seen right payload forward, then keep left rows. Cost: ONE shuffle
  * on the key (same as any join) + an in-partition sort — no range
  * explosion, no per-row probing.
  *
  * Right rows colliding on (key, ts) are resolved DETERMINISTICALLY
  * before the union: one aggregation keeps the max payload struct per
  * (key, ts). Without this, "the last seen snapshot" at a collision
  * would depend on sort-tie order — i.e. on partitioning.
  */
object AsOf {

  /** leftTs/rightTs must be mutually comparable (use unix_micros for
    * timestamps to fix precision). Right payload columns are appended,
    * null when no snapshot precedes the left row.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    // enforce the unique-(key, ts) precondition: max payload struct per
    // snapshot instant (struct comparison = lexicographic over fields,
    // so the pick is total and partitioning-independent)
    val rightUnique = right
      .groupBy(col(key), col(tsCol))
      .agg(max(struct(payloadCols.map(col): _*)).as("_p"))
      .select(Seq(col(key), col(tsCol)) ++
        payloadCols.map(c => col(s"_p.$c").as(c)): _*)
    val leftTagged = left
      .withColumn("_side", lit(1))
      .select(Seq(col(key), col(tsCol), col("_side")) ++
        left.columns.filterNot(c => c == key || c == tsCol).map(col) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_p_$c")): _*)
    val rightTagged = rightUnique
      .withColumn("_side", lit(0))
      .select(Seq(col(key), col(tsCol), col("_side")) ++
        left.columns.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(s"_p_$c")): _*)

    // right rows (side 0) sort before left rows at equal ts, so a
    // snapshot AT the event time is visible to it (<= semantics)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payloadCols.foldLeft(leftTagged.unionByName(rightTagged)) {
      (df, c) => df.withColumn(s"_p_$c", last(col(s"_p_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .drop("_side")
      .withColumnsRenamed(payloadCols.map(c => s"_p_$c" -> c).toMap)
  }
}
