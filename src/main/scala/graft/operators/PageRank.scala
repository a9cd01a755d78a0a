package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over a weighted directed graph, computed
  * entirely in SCALED-INTEGER arithmetic (ranks are BIGINT multiples
  * of 1e-9) so every iteration is bit-exact and engine-portable — a
  * DuckDB twin unrolling the same iterations reproduces the output
  * hash-for-hash, which no floating-point formulation survives
  * (per-partition sum order perturbs last ulps).
  *
  * Training-data use: authority over the source-overlap graph — which
  * domains are HUBS of duplicated content (high inbound shared-shingle
  * mass) versus originators. Reference analogue: the per-source tallies
  * in `code/structure_data.py:239-258` rank sources by row count only;
  * a content-overlap graph is the corpus-level generalization.
  *
  * Scale shape: every frame in the loop is NODE- or EDGE-sized (for
  * the source graph, #domains and #domain-pairs-with-overlap), never
  * corpus-sized — the corpus-scale work happens once in the edge
  * derivation (one shingle-index self-join, see
  * [[graft.dedup.ScaleDedup.sourceOverlap]]). Each iteration is one
  * equi-join (rank → out-edges) + one map-side-combinable sum keyed by
  * destination + one left join back onto nodes: three exchanges over
  * node/edge-sized data, fully distributed, no driver state. Per-
  * iteration `localCheckpoint` keeps the plan depth CONSTANT — the
  * GraphX materialize-per-superstep discipline — where an unpinned
  * fold hands Catalyst a plan tree that grows linearly in iteration
  * count and re-executes the whole prefix at every action.
  *
  * Numerics (all half-up integer division, `(2a+b) div (2b)`):
  *  - r0 = halfup(1e9 / N) per node;
  *  - contribution a→b = halfup(r_a · w_ab / W_a), the r·w product
  *    widened to DECIMAL(38,0) first (r ≤ 2³⁰ scaled; at 100 TB an
  *    edge weight can reach ~1e13 shared shingles — the BIGINT
  *    product would wrap silently; the twin widens to HUGEINT);
  *  - r' = halfup(0.15e9 / N) + halfup(85 · Σcontrib / 100).
  * Dangling mass (nodes with no out-edges) is dropped, not
  * redistributed — the standard simplification, applied identically
  * by the twin, so ranks sum to slightly under 1.0.
  */
object PageRank {

  /** @param nodes 1-column frame of node ids (any type, named `id`)
    * @param edges  (src, dst, w: integral weight > 0)
    * @param iters  fixed iteration count (the oracle unrolls the same)
    * @return (id, authority: double = final rank, exact at 9 dp —
    *         scaled BIGINT / 1e9 is the same IEEE division on both
    *         engines)
    */
  def ranks(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1, 50]")
    val n = nodes.agg(count(lit(1)).as("n"))
    // out-weight totals ride along on every edge row; pinned because
    // the edge frame is re-read once per iteration
    val ew = edges
      .join(edges.groupBy(col("src")).agg(sum(col("w")).as("wout")), "src")
      .localCheckpoint()
    // rank carries the node count so the teleport term needs no
    // per-iteration re-aggregation (n is one broadcast row, not state)
    var r = nodes.crossJoin(broadcast(n))
      .select(col("id"), expr("(2*1000000000 + n) div (2*n)").as("rank"),
        col("n"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(r.select(col("id").as("src"), col("rank")), "src")
        .select(col("dst"),
          expr("(2*CAST(rank AS DECIMAL(38,0))*w + wout) div (2*wout)")
            .as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("c"))
      r = r.select(col("id"), col("n"))
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (expr("(2*150000000 + n) div (2*n)")
            + expr("(170*coalesce(c, 0L) + 100) div 200")).as("rank"),
          col("n"))
        .localCheckpoint()
    }
    r.select(col("id"), (col("rank").cast("double") / lit(1e9)).as("authority"))
  }

  /** The unrolled DuckDB twin: CTEs r0 → c1 → r1 → … replaying the
    * identical half-up integer recurrence over caller-supplied node /
    * edge CTE bodies (`nodesSql` → 1 column `id`; `edgesSql` →
    * `src, dst, w`).
    */
  /** `prefixCtes`, when non-empty, is spliced verbatim between WITH and
    * the `nodes` CTE (it must end with a comma) — lets a caller stage
    * shared input CTEs (e.g. a deterministic hash-sampled doc slice)
    * that both `nodesSql` and `edgesSql` reference by name.
    */
  def oracleSql(nodesSql: String, edgesSql: String, iters: Int,
                prefixCtes: String = ""): String = {
    val steps = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT ew.dst AS id,
         |    CAST(SUM((2*CAST(r.rank AS HUGEINT)*ew.w + ew.wout) // (2*ew.wout)) AS BIGINT) AS c
         |  FROM ew JOIN r${i - 1} r ON r.id = ew.src GROUP BY 1),
         |r$i AS (
         |  SELECT nodes.id,
         |    (2*150000000 + n) // (2*n)
         |      + (170*COALESCE(c, 0) + 100) // 200 AS rank
         |  FROM nodes CROSS JOIN cnt LEFT JOIN c$i ON c$i.id = nodes.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $prefixCtes
       |nodes AS ($nodesSql),
       |cnt AS (SELECT COUNT(*) AS n FROM nodes),
       |e AS ($edgesSql),
       |ow AS (SELECT src, SUM(w) AS wout FROM e GROUP BY 1),
       |ew AS (SELECT e.src, e.dst, e.w, ow.wout FROM e JOIN ow USING (src)),
       |r0 AS (SELECT id, (2*1000000000 + n) // (2*n) AS rank
       |       FROM nodes CROSS JOIN cnt),
       |$steps
       |SELECT id AS source, CAST(rank AS DOUBLE) / 1000000000 AS authority
       |FROM r$iters""".stripMargin
  }
}
