package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.FuzzyDedup

/** J3 fuzzy dedup queries over an engineered name universe: the 64
  * distinct part names plus their trailing-s plurals.
  *
  * `j3_dedup_plural` disables the ratio gate (threshold 2.0) so the
  * merge relation is exactly the singular/plural token rule — which is
  * SQL-expressible, giving a full DuckDB oracle for the connected-
  * components machinery. `j3_fuzzy_dedup` is the complete reference
  * predicate (Ratcliff–Obershelp 0.95 + plural rule), fully oracled:
  * DuckDB lacks the similarity function, so the oracle replays difflib
  * block-matching itself with a recursive CTE
  * (RecursiveOracleSql.fuzzyCanonCtes); FuzzyDedupSpec's union-find
  * vectors pin the Scala side independently.
  */
object DedupQueries extends QueryRegistry {

  private def pluralNames(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.part(s, dir).select(col("p_name").as("name")).distinct()
    base.unionByName(base.select(concat(col("name"), lit("s")).as("name")))
      .distinct()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j3_dedup_plural" -> ((s, dir) =>
      FuzzyDedup.canonicalMap(pluralNames(s, dir), "name", ratioThreshold = 2.0)),

    "j3_fuzzy_dedup" -> ((s, dir) =>
      FuzzyDedup.canonicalMap(pluralNames(s, dir), "name")),
  )

  def oracle: Map[String, String] = Map(
    // Components under the plural-only rule are exactly {base, base+'s'}:
    // canonical = the singular form when it exists in the universe.
    "j3_dedup_plural" ->
      """WITH names AS (
        |  SELECT DISTINCT p_name AS name FROM part
        |  UNION
        |  SELECT DISTINCT p_name || 's' AS name FROM part)
        |SELECT name,
        |  CASE WHEN right(name, 1) = 's'
        |         AND substr(name, 1, length(name) - 1) IN (SELECT name FROM names)
        |       THEN substr(name, 1, length(name) - 1)
        |       ELSE name END AS canonical
        |FROM names""".stripMargin,

    // Full reference predicate: blocked pairs → (difflib ratio > 0.95
    // OR plural token cost < 0.2) → connected components, min name.
    "j3_fuzzy_dedup" -> s"""
      |WITH RECURSIVE
      |${RecursiveOracleSql.fuzzyCanonCtes(
         """SELECT DISTINCT p_name AS name FROM part
           |UNION SELECT DISTINCT p_name || 's' FROM part""".stripMargin)}
      |SELECT name, canonical FROM fz_canon""".stripMargin,
  )
}
