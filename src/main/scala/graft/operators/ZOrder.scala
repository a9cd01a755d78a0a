package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional file
  * pruning — the layout tool for the 100 TB case where consumers
  * filter on TWO keys: a single-key range sort (S15) gives perfect
  * min/max pruning on one column and none on the other, while
  * interleaving the key bits makes every file a tight bounding box in
  * BOTH dimensions, so parquet row-group/file stats prune on either
  * predicate (or their conjunction).
  *
  * The z-value is a pure column expression (bit interleave via
  * shift/mask/or — whole-stage codegen, no UDF), so the only cost over
  * a plain range write is the one range-exchange every sorted layout
  * already pays.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative
    * long columns: x occupies even bit positions, y odd. `bits` ≤ 31
    * keeps the result within a positive long (2·31+1 = 63 — the sign
    * bit stays clear). Values above 2^bits fold into the top cell,
    * which degrades locality, never correctness — callers with wider
    * domains should pre-scale (rank or divide) into the bit budget.
    */
  def zValue(x: Column, y: Column, bits: Int = 31): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val cx = least(x.cast("long"), lit((1L << bits) - 1))
    val cy = least(y.cast("long"), lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftright(cx, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(cy, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Cluster `df` on the Morton curve of (c1, c2): normalize both
    * columns into equal `bits`-wide cell grids (raw interleaving lets
    * whichever key has the larger magnitude dominate the curve and
    * destroys locality on the other), then range-partition by z-value
    * into `numFiles` partitions and sort within each — every output
    * file covers one contiguous curve segment, i.e. a compact 2-D
    * bounding box.
    *
    * The normalization min/max is one extra aggregate over the input —
    * four longs to the driver, scale-independent. Cell mapping runs in
    * doubles (exact for ranges below 2^53, i.e. any real key domain).
    */
  def layoutBy(df: DataFrame, c1: String, c2: String, numFiles: Int,
               bits: Int = 16): DataFrame =
    boundsOf(df, c1, c2) match {
      case None => df // empty or all-null keys: nothing to cluster
      case Some(b) =>
        df.withColumn("_z", zOf(b, c1, c2, bits))
          .repartitionByRange(numFiles, col("_z"))
          .sortWithinPartitions(col("_z"))
          .drop("_z")
    }

  /** Null-safe (min1, max1, min2, max2) of the two layout keys; None
    * when the frame is empty or either key is all-null (min/max
    * aggregates come back null — `getDouble` would NPE, mirroring the
    * GlobalRank.withNtile empty-input guard).
    */
  private def boundsOf(df: DataFrame, c1: String, c2: String)
      : Option[(Double, Double, Double, Double)] = {
    val r = df.agg(
      min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head
    if ((0 to 3).exists(r.isNullAt)) None
    else Some((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
  }

  private def zOf(b: (Double, Double, Double, Double),
                  c1: String, c2: String, bits: Int): Column = {
    val cells = (1L << bits) - 1
    def cell(c: String, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * cells).cast("long")
    zValue(cell(c1, b._1, b._2), cell(c2, b._3, b._4), bits)
  }

  /** The production composition of BOTH pruning layers: hive-partition
    * directories on a coarse key (`partCol` — pruned at runtime by
    * dynamic partition pruning when a dim filter reaches the join) and
    * a Morton curve of (c1, c2) WITHIN each directory (pruned by
    * parquet min/max stats under predicates on either key). The range
    * exchange leads with `partCol`, so each output file lands in one
    * directory and covers one contiguous curve segment — write with
    * `.write.partitionBy(partCol)`.
    */
  def layoutWithin(df: DataFrame, partCol: String, c1: String, c2: String,
                   numFiles: Int, bits: Int = 16): DataFrame =
    boundsOf(df, c1, c2) match {
      case None => df // empty or all-null keys: nothing to cluster
      case Some(b) =>
        df.withColumn("_z", zOf(b, c1, c2, bits))
          .repartitionByRange(numFiles, col(partCol), col("_z"))
          .sortWithinPartitions(col(partCol), col("_z"))
          .drop("_z")
    }
}
