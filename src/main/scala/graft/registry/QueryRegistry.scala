package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registry per operator family: named queries (name → runner over a
  * scale-factor dir) with their DuckDB oracle SQL twins. Column names in
  * the Spark result and the oracle SQL MUST match exactly — the driver
  * sorts columns by name before hashing.
  */
trait QueryRegistry {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
