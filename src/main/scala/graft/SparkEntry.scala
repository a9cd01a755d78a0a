package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query/oracle pairs live in per-family registries under
  * [[graft.registry]]; this object only aggregates them.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.AnalyticsQueries.queries("j1_star_join")(spark, "/root/testdata/sf0.001")

  private def registries: Seq[registry.QueryRegistry] = Seq(
    registry.AnalyticsQueries,
    registry.EtlQueries,
    registry.AggQueries,
    registry.DedupQueries,
    registry.IpesQueries,
    registry.TextQueries,
    registry.ScaleDedupQueries,
    registry.SimilarityQueries,
    registry.MmStreamQueries,
    registry.OpsQueries,
    registry.SourceQueries,
    registry.CorpusOpsQueries,
    registry.SketchQueries,
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registries.map(_.oracle).reduce(_ ++ _)
}
