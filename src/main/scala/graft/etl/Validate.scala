package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** F15/A13 — constraint validation as a predicate split with
  * observation metrics, replacing the reference's per-record Pydantic
  * loop (`structure_data.py:263-288`). The split is two filters over
  * one cached plan; counts come from `Observation` so they cost no
  * extra pass when the valid side is consumed.
  */
object Validate {

  case class Split(valid: DataFrame, invalid: DataFrame)

  def split(df: DataFrame, constraint: Column): Split =
    Split(df.filter(constraint), df.filter(!coalesce(constraint, lit(false))))

  /** Valid rows + an Observation that yields n_valid/n_invalid once the
    * returned frame is consumed by an action.
    */
  def observedValid(df: DataFrame, constraint: Column): (DataFrame, Observation) = {
    val obs = Observation()
    val observed = df.observe(obs,
      sum(when(constraint, 1L).otherwise(0L)).as("n_valid"),
      sum(when(coalesce(constraint, lit(false)), 0L).otherwise(1L)).as("n_invalid"))
    (observed.filter(constraint), obs)
  }

  /** The silver-layer constraint (`code/schemas.py:27` + required
    * fields): filing_count ≥ 0 and key identity fields present.
    */
  def companyConstraint: Column =
    col("filing_count") >= 0 &&
      col("id").isNotNull && col("id") =!= "" &&
      col("entity_name").isNotNull && col("entity_name") =!= ""

  /** A13: stats row for the history sink (S8). */
  def stats(split: Split): DataFrame = {
    val v = split.valid.count()
    val i = split.invalid.count()
    val spark = split.valid.sparkSession
    import spark.implicits._
    Seq((v, i, v + i)).toDF("valid_records", "invalid_records", "total_records")
  }
}
