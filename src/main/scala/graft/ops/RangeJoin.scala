package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join. The naive form is an inequality
  * join — Spark plans a broadcast nested loop or cartesian product,
  * which dies at scale. The scale path quantizes the domain into
  * fixed-width buckets: each interval explodes into the buckets it
  * covers, points hash-join on their single bucket, and an exact
  * containment filter finishes the job — ONE equi-join shuffle, with
  * duplicate-free output because a (point, interval) match shares
  * exactly the point's bucket. Choose `width` near the median interval
  * length: explosion factor ≈ len/width + 1.
  */
object RangeJoin {

  /** points carries `tsCol`; intervals carries `startCol`/`endCol`
    * (inclusive bounds, all numeric/long).
    */
  def bucketed(
      points: DataFrame, intervals: DataFrame,
      tsCol: String, startCol: String, endCol: String,
      width: Long): DataFrame = {
    val p = points.withColumn("_b", floor(col(tsCol) / width))
    val i = intervals.withColumn("_b",
      explode(sequence(floor(col(startCol) / width), floor(col(endCol) / width))))
    p.join(i, "_b")
      .filter(col(tsCol).between(col(startCol), col(endCol)))
      .drop("_b")
  }
}
