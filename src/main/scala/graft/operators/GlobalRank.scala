package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking without a single-partition sort.
  *
  * `row_number().over(Window.orderBy(...))` with no partition key is
  * the classic scale-killer: Spark plans one `Exchange
  * SinglePartition` and the whole dataset funnels through one task.
  * The scalable equivalent is the three-step offset trick:
  *
  *  1. range-partition + locally sort by the (total-order) sort key —
  *     Spark's parallel sort, every partition an ordered contiguous
  *     key range;
  *  2. count rows per partition (one row PER PARTITION, not per data
  *     row) and prefix-sum the counts on the driver — O(#partitions);
  *  3. per-partition `row_number` (window PARTITIONED by the range
  *     partition id — parallel) plus the partition's offset, folded
  *     in as a literal CASE chain (#partitions branches).
  *
  * The sort columns must form a total order (append a unique id as
  * the last key) so the range boundaries cannot split ties across
  * partitions in an engine-dependent way.
  *
  * `withNtile` replays SQL NTILE semantics on top of the global row
  * number: n rows into k buckets, sizes q = n div k with the first
  * n mod k buckets one larger — bucket boundaries depend only on
  * (rn, n, k), all exact integer arithmetic, so any engine agrees
  * bit-for-bit.
  */
object GlobalRank {

  /** df + `rnCol` = exact global 1-based row number under `order`. */
  def withRowNumber(df: DataFrame, order: Seq[Column], rnCol: String,
      numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // localCheckpoint pins the ranged layout: the count job below and
    // the caller's downstream job would otherwise EACH re-execute
    // repartitionByRange, whose sampled boundaries differ run-to-run
    // (the sampler's seed varies per execution) — offsets computed
    // against one layout would be applied to another.
    val ranged = df
      .repartitionByRange(n, order: _*)
      .withColumn("_gr_pid", spark_partition_id())
      .localCheckpoint()
    // tiny aggregate: one row per partition, collected to the driver
    val counts = ranged.groupBy(col("_gr_pid"))
      .agg(count(lit(1)).as("_gr_cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive prefix sums: rows in partitions strictly before pid
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val w = Window.partitionBy(col("_gr_pid")).orderBy(order: _*)
    val local = ranged.withColumn("_gr_rnl", row_number().over(w).cast("long"))
    // Small partition counts fold the offsets in as a literal CASE
    // chain (stays inside codegen, no extra plan node); past a few
    // hundred partitions a CASE that long bloats codegen, so the
    // offsets ship as a broadcast-joined two-column frame instead.
    val out =
      if (counts.length <= 256) {
        val offCol = counts.foldLeft(lit(0L)) { case (acc, (pid, _)) =>
          when(col("_gr_pid") === pid, lit(offsets(pid))).otherwise(acc)
        }
        local.withColumn(rnCol, col("_gr_rnl") + offCol)
      } else {
        val spark = df.sparkSession
        import spark.implicits._
        val offDf = broadcast(
          offsets.toSeq.toDF("_gr_pid", "_gr_off"))
        local.join(offDf, "_gr_pid")
          .withColumn(rnCol, col("_gr_rnl") + col("_gr_off"))
          .drop("_gr_off")
      }
    out.drop("_gr_pid", "_gr_rnl")
  }

  /** df + `bucketCol` = exact global NTILE(k) under `order`. */
  def withNtile(df: DataFrame, order: Seq[Column], k: Int,
      bucketCol: String): DataFrame = {
    require(k >= 1, s"NTILE bucket count must be >= 1, got $k")
    val withRn = withRowNumber(df, order, "_gr_rn")
    // exact total from the rank column itself — a second tiny agg;
    // max() is NULL on an empty input (no rows → no buckets to size),
    // so read it null-safely and short-circuit to the empty frame.
    val totalRow = withRn.agg(max(col("_gr_rn"))).head()
    if (totalRow.isNullAt(0))
      return withRn.withColumn(bucketCol, lit(null).cast("int")).drop("_gr_rn")
    val total = totalRow.getLong(0)
    val q = total / k
    val r = total % k
    val cut = r * (q + 1) // rows in the first r (one-larger) buckets
    // the otherwise-branch divisor: only reachable when rn > cut,
    // which requires q >= 1 (q == 0 puts every row in the first arm)
    val qSafe = math.max(q, 1L)
    withRn.withColumn(bucketCol,
        when(col("_gr_rn") <= cut,
          expr(s"(_gr_rn - 1) div ${q + 1}") + 1L)
          .otherwise(lit(r) + expr(s"(_gr_rn - 1 - $cut) div $qSafe") + 1L)
          .cast("int"))
      .drop("_gr_rn")
  }
}
