package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.ScaleDedup

/** Scale-dedup extension family over `documents`, with engineered
  * duplicates so results are non-trivially non-empty: exact copies
  * (doc_id % 5) and near-dup copies with three appended tokens
  * (doc_id % 7), both at doc_id + 100000.
  *
  * `dedup_exact` and `dedup_ngram_jaccard` carry full DuckDB oracles.
  * MinHash and SimHash hash with xxhash64 (no DuckDB equivalent) —
  * rows-only here; ScaleDedupSpec pins their recall against the exact
  * Jaccard pairs.
  */
object ScaleDedupQueries extends QueryRegistry {

  private def withExactDups(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .repartition(s.sparkContext.defaultParallelism)
  }

  def withNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz9 yy8 xx7")).as("text")))
      // single-row-group local parquet -> 1 scan task; the shingle
      // explode + tokenize downstream is CPU-bound, so spread it first.
      .repartition(s.sparkContext.defaultParallelism)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) =>
      ScaleDedup.exact(withExactDups(s, dir), "doc_id", "text")),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      ScaleDedup.ngramJaccardPairs(withNearDups(s, dir), "doc_id", "text",
        n = 3, threshold = 0.5)),

    "dedup_minhash" -> ((s, dir) =>
      ScaleDedup.minhashCandidates(withNearDups(s, dir), "doc_id", "text")),

    "dedup_simhash" -> ((s, dir) =>
      ScaleDedup.simhashPairs(
        ScaleDedup.simhash(withNearDups(s, dir), "doc_id", "text"),
        maxHamming = 3)),
  )

  private val exactDupsSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0""".stripMargin

  private val nearDupsSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 100000, text || ' zz9 yy8 xx7' FROM documents WHERE doc_id % 7 = 0""".stripMargin

  def oracle: Map[String, String] = Map(
    "dedup_exact" -> s"""
      |WITH docs AS ($exactDupsSql)
      |SELECT md5(array_to_string(string_split_regex(lower(trim(text)), '\\s+'), ' ')) AS fingerprint,
      |  MIN(doc_id) AS canonical_id, COUNT(*) AS n_docs
      |FROM docs GROUP BY 1""".stripMargin,

    "dedup_ngram_jaccard" -> s"""
      |WITH docs AS ($nearDupsSql),
      |tok AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM docs),
      |sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      |  FROM tok, unnest(generate_series(1, len(t) - 2)) AS u(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= 0.5""".stripMargin,
  )
}
