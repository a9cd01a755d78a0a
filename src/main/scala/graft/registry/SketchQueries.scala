package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions
import graft.text.TextAnalysis

/** Mergeable-sketch family — the summary structures a 100 TB corpus
  * pipeline uses when a second full pass (or a full-width shuffle of
  * raw tokens) is too expensive: Count-Min for heavy-hitter counts,
  * DataSketches HLL for mergeable distinct counts. Both are
  * order-independent commutative aggregates with map-side partials of
  * FIXED size (a sketch blob, not data-sized state), so at cluster
  * scale each executor ships kilobytes to the merge regardless of
  * corpus size, and per-day sketches union incrementally without
  * touching raw history.
  *
  * Oracle pattern (`a8_distinct_approx`): each query computes the
  * EXACT side next to the sketch side and emits tolerance booleans
  * the DuckDB twin re-derives and asserts as literal TRUE — the exact
  * columns ride the hash gate, the sketch's guarantee becomes a
  * testable predicate. Fixed seeds / lgK make both sides
  * deterministic. The exact columns exist FOR the oracle; the
  * production path at scale is the sketch alone.
  */
object SketchQueries extends QueryRegistry {

  private def tokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("token"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Heavy hitters under a Count-Min guarantee: the exact top-20
    // tokens (count desc, token asc — deterministic on both engines)
    // probed against a corpus-wide CMS(eps=1e-3, conf=0.99, seed=42).
    // CMS never underestimates (a deterministic property of the
    // structure), and overestimates by at most eps·N with prob 1−δ —
    // with the seed pinned, a deterministic outcome the boolean
    // asserts. The sketch is ONE fixed-size aggregate over the corpus
    // (map-side partials merge associatively); the probe is a 20-row
    // broadcast cross join through the native cms_estimate expression
    // — no second corpus pass, no driver collect of the blob.
    "text_heavy_hitters_sketch" -> ((s, dir) => {
      val toks = tokens(s, dir).localCheckpoint() // feeds exact + sketch sides
      val top = toks.groupBy(col("token"))
        .agg(count(lit(1)).cast("long").as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(20)
      val sk = toks.agg(
        count_min_sketch(col("token"), lit(0.001d), lit(0.99d), lit(42)).as("cms"),
        count(lit(1)).cast("long").as("n"))
      val est = GraftFunctions.cmsEstimate(col("cms"), col("token"))
      top.crossJoin(broadcast(sk))
        .select(col("token"), col("cnt"),
          (est >= col("cnt") &&
            est <= col("cnt") + ceil(col("n") * lit(0.001d)).cast("long"))
            .as("est_in_bounds"))
    }),

    // Mergeable distinct counts: per-source HLL(lgK=14) sketches next
    // to exact count_distinct, then ONE union row ('__ALL__') whose
    // estimate comes from hll_union_agg over the per-source sketches —
    // the incremental path (union yesterday's sketch with today's)
    // checked against the exact global distinct. lgK=14 → ~0.8%
    // standard error; the 5% tolerance is a hard floor the twin
    // asserts, not a wish.
    "text_distinct_hll" -> ((s, dir) => {
      val toks = tokens(s, dir).localCheckpoint() // per-source + global exact
      val per = toks.groupBy(col("source"))
        .agg(hll_sketch_agg(col("token"), 14).as("sk"),
          count_distinct(col("token")).as("exact_distinct"))
      def okOf(est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
        (abs(est - exact) <= exact * lit(0.05d)).as("est_ok")
      val perOut = per.select(col("source"), col("exact_distinct"),
        okOf(hll_sketch_estimate(col("sk")).cast("long"), col("exact_distinct")))
      val allExact = toks.agg(count_distinct(col("token")).as("exact_distinct"))
      val allOut = per.agg(hll_union_agg(col("sk")).as("sk"))
        .crossJoin(broadcast(allExact))
        .select(lit("__ALL__").as("source"), col("exact_distinct"),
          okOf(hll_sketch_estimate(col("sk")).cast("long"), col("exact_distinct")))
      perOut.unionByName(allOut)
    }))

  def oracle: Map[String, String] = Map(
    // exact top-20 replayed (same count-desc, token-asc tie rule);
    // the CMS bound booleans assert TRUE.
    "text_heavy_hitters_sketch" -> """
      |WITH tok AS (
      |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      |  FROM documents),
      |cnts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
      |         FROM tok GROUP BY token)
      |SELECT token, cnt, TRUE AS est_in_bounds
      |FROM cnts ORDER BY cnt DESC, token LIMIT 20""".stripMargin,

    "text_distinct_hll" -> """
      |WITH tok AS (
      |  SELECT source,
      |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      |  FROM documents)
      |SELECT source, CAST(COUNT(DISTINCT token) AS BIGINT) AS exact_distinct,
      |  TRUE AS est_ok
      |FROM tok GROUP BY source
      |UNION ALL
      |SELECT '__ALL__', CAST(COUNT(DISTINCT token) AS BIGINT), TRUE
      |FROM tok""".stripMargin)
}
