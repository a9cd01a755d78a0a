package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Oracle-stable numeric aggregation helpers.
  *
  * Summing IEEE doubles is order-dependent, and Spark's partial
  * aggregation order differs run to run (and from any other engine).
  * Casting to decimal first makes the sum exact and associative, so the
  * result is bit-identical regardless of partitioning — which is what
  * both the DuckDB oracle compare and 1000-executor reproducibility
  * need. The final cast back to double keeps schemas simple.
  */
object OracleSafe {
  /** Exact, order-independent sum of a double column (2 fractional digits). */
  def decSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact sum of a product of two (price, 1-discount style) doubles. */
  def decSumProduct(a: Column, b: Column): Column =
    sum(a.cast(DecimalType(18, 2)) * b.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Order-independent average: exact decimal sum / count, divided as doubles. */
  def decAvg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 2))).cast(DoubleType) / count(lit(1)))
}
