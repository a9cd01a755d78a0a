package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities. AQE's skew-join split handles most cases at
  * runtime; explicit salting remains the tool when one hot key dwarfs
  * everything (AQE can only split what it can partition).
  */
object Skew {

  /** Salted inner equi-join for a skewed LEFT side: left rows get a
    * deterministic salt in [0, salts) derived from the whole row hash;
    * the right side is replicated once per salt; the join key becomes
    * (key, salt), splitting each hot key across `salts` reducers.
    * Result is row-identical to the plain join (inner, equi) — the salt
    * never changes match semantics, only placement.
    */
  def saltedEquiJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(salts)))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLeft.join(saltedRight,
      saltedLeft(leftKey) === saltedRight(rightKey) &&
        saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }
}
