package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.OracleSafe._

/** Aggregation / window / join families (SURVEY §2.3–2.5, J2/J4/J5,
  * S2/S5).
  *
  * Determinism notes (these run on any partitioning, so every tie is
  * broken explicitly):
  *  - group-collects are sorted inside the group before serialization;
  *  - argmax/argmin use composite keys (value-length + value, or
  *    date + key);
  *  - top-k/mode order by (count desc, value asc).
  * All aggregations are partial-aggregate (map-side combine) friendly;
  * the window queries shuffle once on their partition key — at 100 TB
  * that single hash partition by customer key is the unavoidable
  * minimum for "latest per group".
  */
object AggQueries extends QueryRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A2: group-collect (nest) + count, serialized as a sorted CSV
    // string so the oracle can compare exactly.
    "a1_group_collect" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(
          concat_ws(",", transform(array_sort(collect_list(col("l_linenumber"))),
            _.cast("string"))).as("line_numbers"),
          count(lit(1)).as("filing_count"))),

    // A3: longest name per group, ties to the lexicographically greatest.
    "a3_argmax_longest" -> ((s, dir) =>
      Tables.part(s, dir)
        .groupBy(col("p_brand"))
        .agg(max_by(col("p_name"),
          concat(lpad(length(col("p_name")).cast("string"), 3, "0"), col("p_name")))
          .as("display_name"))),

    // A4: boolean ANY per group.
    "a4_bool_any" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(
          bool_or(col("o_totalprice") > 300000).as("has_big_order"),
          count(lit(1)).as("n_orders"))),

    // A5: latest date per group.
    "a5_max_date" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).cast("date").as("latest_order_date"))),

    // A6: sorted distinct-set per group, serialized for the oracle.
    "a6_distinct_set" -> ((s, dir) =>
      Tables.customer(s, dir)
        .groupBy(col("c_nationkey"))
        .agg(concat_ws(",", array_sort(collect_set(col("c_mktsegment"))))
          .as("segments"))),

    // A8 at scale: exact distinct (full shuffle of the key domain) vs
    // the HLL sketch (mergeable, the 100 TB default). The approx query
    // is FULLY oracled: it emits the exact count plus a boolean
    // tolerance check on the sketch (|approx − exact| ≤ 5%·exact,
    // ~2.5σ at rsd 0.02 and deterministic — the sketch is hash-based),
    // which DuckDB asserts as literal TRUE.
    "a8_distinct_exact" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"))),

    "a8_distinct_approx" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          approx_count_distinct(col("l_partkey"), 0.02).as("apx"))
        .select(col("l_returnflag"), col("n_parts"),
          (abs(col("apx") - col("n_parts")) <= col("n_parts") * 0.05)
            .as("within_tol"))),

    // Percentiles: exact continuous interpolation (same formula as
    // DuckDB quantile_cont); approx_percentile is the 100 TB path
    // (mergeable sketch, no full sort of the column). The approx query
    // carries the exact values plus boolean 5%-tolerance checks the
    // oracle asserts as literal TRUE.
    "a15_percentiles" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))),

    "a15_percentiles_approx" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("m_apx"),
          expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("p_apx"))
        .select(col("l_returnflag"), col("median_price"), col("p90_price"),
          (abs(col("m_apx") - col("median_price")) <= col("median_price") * 0.05)
            .as("median_within_tol"),
          (abs(col("p_apx") - col("p90_price")) <= col("p90_price") * 0.05)
            .as("p90_within_tol"))),

    // Deterministic distributed sampling: bottom-k-by-md5 per group via
    // the custom HashSampleK aggregate (§2.8 UDAF surface) — the
    // reproducible per-group sample a dataset card/debug view needs.
    "a16_sample_k" -> ((s, dir) =>
      Tables.customer(s, dir)
        .groupBy(col("c_mktsegment"))
        .agg(concat_ws(",",
          graft.functions.GraftFunctions.sampleK(col("c_name"), 5))
          .as("sample_names"))),

    // A9: global mode with deterministic tie-break.
    "a9_mode" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("event_type").asc)
        .limit(1)
        .select(col("event_type").as("top_event_type"))),

    // W1: latest row per group via row_number window.
    "w1_latest_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("latest_date"))
    }),

    // W1 via the native partial/final top-k operator (custom
    // LogicalPlan + SparkStrategy + SparkPlan pair): identical result,
    // but only <=1 row per key per input partition reaches the
    // exchange instead of every row.
    "w1_latest_native" -> ((s, dir) =>
      graft.plans.TopK.perKey(Tables.orders(s, dir),
          Seq(col("o_custkey")),
          Seq(col("o_orderdate").desc, col("o_orderkey").desc), k = 1)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("latest_date"))),

    // W2: first element of an in-group sorted array (array path kept
    // deliberately: exercises sort_array + element_at nest semantics).
    "w2_first_after_sort" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(try_element_at(
          array_sort(collect_list(struct(col("l_linenumber"), col("l_partkey")))),
          lit(1)).getField("l_partkey").as("first_partkey"))),

    // W3/W4: global sort + top-k with tie-break.
    "w3_global_sort" -> ((s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // W5: single latest row overall (micros-precision ordering to match
    // the oracle exactly — see Tables.events nanos note).
    "w5_latest_run" -> ((s, dir) =>
      Tables.events(s, dir)
        .orderBy(unix_micros(col("ts")).desc, col("event_id").desc)
        .limit(1)
        .select(col("event_id"), col("ts").cast("date").as("event_date"))),

    // S2+S5: multi-query union then dedup on ingest.
    "s2_union_dedup" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      o.filter(col("o_orderstatus") === "O")
        .unionByName(o.filter(col("o_totalprice") > 100000))
        .dropDuplicates("o_orderkey")
    }),

    // J2: cache-lookup left join with miss fallback.
    "j2_cache_lookup" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val cache = c.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("k"),
          concat(lit("seg_"), col("c_custkey") % 3).as("cached_label"))
      c.join(broadcast(cache), c("c_custkey") === cache("k"), "left")
        .select(col("c_custkey"),
          coalesce(col("cached_label"), lit("MISS")).as("label"))
    }),

    // J4/S11: incremental anti-join against a completed-work manifest.
    "j4_anti_join" -> ((s, dir) => {
      val manifest = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      Tables.lineitem(s, dir)
        .join(manifest, col("l_orderkey") === manifest("o_orderkey"), "left_anti")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"))
    }),

    // A17: rolling 7-day mean of daily totals. The outer window is a
    // single ordered run over |days| rows — the correct scale shape
    // (the heavy reduction to daily grain happened in the shuffle agg).
    "a17_rolling_avg" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(decSum(col("value")).as("daily_total"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily.withColumn("rolling_avg", round(avg(col("daily_total")).over(w), 6))
        .select(col("day").cast("string").as("day"),
          col("daily_total"), col("rolling_avg"))
    }),

    // J6: full-outer reconciliation audit — the source-vs-sink count
    // check every incremental pipeline runs (rows only-left /
    // only-right / both), as one join + one aggregate.
    "j6_full_outer_audit" -> ((s, dir) => {
      val a = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"))
      val b = Tables.orders(s, dir).filter(col("o_totalprice") > 100000)
        .select(col("o_orderkey").as("k"))
      a.join(b, col("o_orderkey") === col("k"), "full_outer")
        .agg(
          sum(when(col("k").isNull, 1).otherwise(0)).cast("long").as("only_open"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0)).cast("long").as("only_big"),
          sum(when(col("o_orderkey").isNotNull && col("k").isNotNull, 1).otherwise(0))
            .cast("long").as("n_both"))
    }),

    // A18: unpivot (wide metrics → long) via the stack generator — the
    // melt every metrics exporter needs.
    "a18_unpivot" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("double").as("n_orders"),
          decSum(col("o_totalprice")).as("revenue"))
        .select(col("o_orderpriority"),
          expr("stack(2, 'n_orders', n_orders, 'revenue', revenue) AS (metric, value)"))),

    // A19: pivot (long → wide) with explicit values (no extra
    // distinct-values job) — counts per (nation, segment) as columns.
    "a19_pivot" -> ((s, dir) => {
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      Tables.customer(s, dir)
        .groupBy(col("c_nationkey"))
        .pivot("c_mktsegment", segs)
        .agg(count(lit(1)))
        .select(col("c_nationkey") +:
          segs.map(x => coalesce(col(x), lit(0L)).as(x)): _*)
    }),

    // stream-static enrichment join: the batch twin of a readStream
    // joined to a broadcast dimension (the plan is identical on a
    // stream — Spark's unified-engine contract; EventStreamsSpec
    // drives the streaming execution).
    "stream_enrich_join" -> ((s, dir) => {
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
      Tables.events(s, dir)
        .join(broadcast(dim), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("total_value"))
    }),

    // A21: rollup (grouping sets) — subtotals per (status, priority),
    // per status, and grand total in ONE aggregation pass (Spark
    // expands the grouping sets map-side; no re-scan per level).
    "a21_rollup" -> ((s, dir) =>
      Tables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("revenue"))),

    // A22: full CUBE over two dims — every grouping-set combination in
    // one Expand + one shuffle (Catalyst plans cube as a 4-way Expand,
    // not 4 scans). Subtotal null markers coalesced to a sentinel, same
    // as the rollup form.
    "a22_cube" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("revenue"))),

    // A23: exact global NTILE(8) quantile buckets WITHOUT the
    // single-partition window sort — GlobalRank range-partitions,
    // offsets per-partition row_numbers by an O(#partitions) driver
    // prefix sum, and replays NTILE's integer bucket-boundary rule.
    // (o_totalprice, o_orderkey) is a total order, so range
    // boundaries cannot split ties engine-dependently.
    "a23_ntile_buckets" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice").cast("decimal(18,2)").as("p"))
      graft.operators.GlobalRank
        .withNtile(o, Seq(col("p"), col("o_orderkey")), 8, "bucket")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
          min(col("p")).cast("double").as("min_price"),
          max(col("p")).cast("double").as("max_price"))
    }),

    // A24: Pearson correlation from EXACT decimal moments. Spark's
    // corr() sums doubles in partition order (non-associative — a
    // different split changes the last ulps); summing decimal(18,2)
    // values and their exact decimal products instead makes all five
    // moments partitioning-invariant, and the final IEEE formula on
    // identical inputs is identical on any engine. Map-side combine
    // applies to every moment — one shuffle of 6 numbers per group.
    "a24_corr" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          col("l_quantity").cast("decimal(18,2)").as("x"),
          col("l_extendedprice").cast("decimal(18,2)").as("y"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        // final round to 9: beyond ~2^53 of accumulated moments the
        // decimal→double casts themselves differ by an ulp between
        // engines (two-rounding casts of >53-bit unscaled values), so
        // the raw 17-digit doubles cannot be compared bit-for-bit
        .select(col("l_returnflag"), col("n"),
          round((col("n").cast("double") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double"))
            / (sqrt(col("n").cast("double") * col("sxx").cast("double")
                - col("sx").cast("double") * col("sx").cast("double"))
              * sqrt(col("n").cast("double") * col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double"))), 9)
            .as("corr_qty_price"))),

    // A25: group-wise least-squares regression (price ~ quantity) from
    // the same exact decimal moments as a24 — slope and intercept are
    // closed-form in (n, sx, sy, sxx, sxy), so the whole fit is one
    // map-side-combinable aggregation; no iterative solver, no second
    // pass. round(9) for the same >2^53 cast-ulp reason as a24.
    "a25_regression" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          col("l_quantity").cast("decimal(18,2)").as("x"),
          col("l_extendedprice").cast("decimal(18,2)").as("y"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .withColumn("slope",
          round((col("n").cast("double") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double"))
            / (col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")), 9))
        .withColumn("intercept",
          round((col("sy").cast("double") - col("slope") * col("sx").cast("double"))
            / col("n").cast("double"), 9))
        .select(col("l_returnflag"), col("n"), col("slope"), col("intercept"))),

    // A26: winsorization at exact nearest-rank p05/p95 per group — the
    // outlier clip a feature pipeline runs before aggregating. The
    // boundary ranks are found by a per-group window row_number over a
    // TOTAL order (value + unique line key), so both engines pick the
    // identical boundary rows; clipping and the clipped sum stay in
    // exact decimals. ONE scan of the fact: the boundary values are
    // broadcast within each group by a second (unordered) window pass
    // over the SAME partitioning — no join back to a re-scanned fact,
    // no extra exchange (the group-hash shuffle and sort are reused;
    // at 100 TB re-scanning the fact would double the I/O bill). The
    // per-group sort is the unavoidable cost of an EXACT percentile
    // (the approx path is a15_percentiles_approx).
    "a26_winsorize" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("decimal(18,2)").as("x"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("x"), col("l_orderkey"), col("l_linenumber"))
      val wg = Window.partitionBy(col("l_returnflag"))
      val ranked = li
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(wg))
      val clipped = ranked
        .withColumn("lo", max(when(
          col("rn") === ceil(col("cnt") * 0.05).cast("int"), col("x"))).over(wg))
        .withColumn("hi", max(when(
          col("rn") === ceil(col("cnt") * 0.95).cast("int"), col("x"))).over(wg))
      clipped.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("long").as("n"),
          max(col("lo")).cast("double").as("p05"),
          max(col("hi")).cast("double").as("p95"),
          sum(least(greatest(col("x"), col("lo")), col("hi")))
            .cast("double").as("winsorized_sum"))
    }),

    // A27: Welch's two-sample t-test (urgent vs low-priority order
    // values) from exact decimal moments, computed in ONE conditional
    // aggregation pass — no per-group frames, no 1-row×1-row join
    // (which would plan a nested loop). The t statistic and Welch df
    // are closed-form in the six moments; final round(9) for the
    // >2^53 decimal→double cast ulp (see a24).
    "a27_ab_stats" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select((col("o_orderpriority") === "1-URGENT").as("g"),
          col("o_totalprice").cast("decimal(18,2)").as("x"))
      val zero = lit(0).cast("decimal(18,2)")
      val agg = o.agg(
        sum(when(col("g"), 1).otherwise(0)).cast("long").as("n1"),
        sum(when(col("g"), col("x")).otherwise(zero)).as("sx1"),
        sum(when(col("g"), col("x") * col("x")).otherwise(zero * zero)).as("sxx1"),
        sum(when(!col("g"), 1).otherwise(0)).cast("long").as("n2"),
        sum(when(!col("g"), col("x")).otherwise(zero)).as("sx2"),
        sum(when(!col("g"), col("x") * col("x")).otherwise(zero * zero)).as("sxx2"))
      def d(c: String) = col(c).cast("double")
      val (m1, m2) = (d("sx1") / d("n1"), d("sx2") / d("n2"))
      val v1 = (d("sxx1") - d("sx1") * d("sx1") / d("n1")) / (d("n1") - 1)
      val v2 = (d("sxx2") - d("sx2") * d("sx2") / d("n2")) / (d("n2") - 1)
      val (se1, se2) = (v1 / d("n1"), v2 / d("n2"))
      agg.select(col("n1"), col("n2"),
        round(m1 - m2, 6).as("mean_diff"),
        round((m1 - m2) / sqrt(se1 + se2), 9).as("t_stat"),
        round((se1 + se2) * (se1 + se2)
          / (se1 * se1 / (d("n1") - 1) + se2 * se2 / (d("n2") - 1)), 3)
          .as("df_welch"))
    }),

    // J7: left-semi join — orders with at least one oversized line.
    // Semi joins short-circuit on first match and never duplicate the
    // left side; the filter on the build side cuts the hash table
    // before the shuffle.
    "j7_semi_join" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .filter(col("l_quantity") >= 45).select(col("l_orderkey"))
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === big("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // set operations: the audit forms of EXCEPT/INTERSECT over derived
    // key sets (both plan as hash aggregates + joins — no sort).
    "s16_set_ops" -> ((s, dir) => {
      val open = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
        .select(col("o_custkey"))
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 200000)
        .select(col("o_custkey"))
      open.intersect(big).withColumn("set_kind", lit("both"))
        .unionByName(open.except(big).withColumn("set_kind", lit("open_only")))
    }),

    // A20: fixed-width histogram via width_bucket — one map-side
    // bucket assignment + one hash agg, the profile/monitoring shape.
    "a20_histogram" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(width_bucket(col("value"), lit(0.0), lit(500.0), lit(10)).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))),

    // CDC merge/upsert: apply a change batch (updates + deletes) to a
    // base table, latest sequence wins per key. Runs through the
    // native top-k operator (k=1 by seq desc) so only one candidate
    // row per key per partition reaches the exchange — the incremental
    // maintenance shape for a 100 TB dimension table.
    "merge_upsert" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val base = c.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        lit(0L).as("seq"), lit("U").as("op"))
      val changes = c.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal") + 1000.0, 2).as("c_acctbal"),
          lit(1L).as("seq"),
          when(col("c_custkey") % 20 === 0, "D").otherwise("U").as("op"))
      graft.plans.TopK.perKey(base.unionByName(changes),
          Seq(col("c_custkey")), Seq(col("seq").desc), k = 1)
        .filter(col("op") =!= "D")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    }),

    // J5: nest → re-flatten roundtrip (collect_list then explode); the
    // oracle is the identity projection, which is the point.
    "j5_explode_roundtrip" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(collect_list(col("l_linenumber")).as("lns"))
        .select(col("l_orderkey"), explode(col("lns")).as("ln"))),
  )

  def oracle: Map[String, String] = Map(
    "a1_group_collect" ->
      """SELECT l_orderkey,
        |  string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS line_numbers,
        |  COUNT(*) AS filing_count
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,

    "a3_argmax_longest" ->
      """SELECT p_brand,
        |  arg_max(p_name, lpad(CAST(length(p_name) AS VARCHAR), 3, '0') || p_name)
        |    AS display_name
        |FROM part GROUP BY p_brand""".stripMargin,

    "a4_bool_any" ->
      """SELECT o_custkey, bool_or(o_totalprice > 300000) AS has_big_order,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey""".stripMargin,

    "a5_max_date" ->
      """SELECT o_custkey, CAST(MAX(o_orderdate) AS DATE) AS latest_order_date
        |FROM orders GROUP BY o_custkey""".stripMargin,

    "a6_distinct_set" ->
      """SELECT c_nationkey,
        |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
        |FROM customer GROUP BY c_nationkey""".stripMargin,

    "a8_distinct_exact" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "a8_distinct_approx" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "a15_percentiles_approx" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
        |  TRUE AS median_within_tol, TRUE AS p90_within_tol
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "a15_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "a16_sample_k" ->
      """SELECT c_mktsegment,
        |  array_to_string(
        |    list_transform(
        |      list_slice(list_sort(list({'h': md5(c_name), 'v': c_name})), 1, 5),
        |      x -> x.v), ',') AS sample_names
        |FROM customer GROUP BY c_mktsegment""".stripMargin,

    "a9_mode" ->
      """SELECT event_type AS top_event_type FROM events
        |GROUP BY event_type ORDER BY COUNT(*) DESC, event_type LIMIT 1""".stripMargin,

    "w1_latest_per_group" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS latest_date
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1""".stripMargin,

    "w1_latest_native" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS latest_date
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1""".stripMargin,

    "w2_first_after_sort" ->
      """SELECT l_orderkey, l_partkey AS first_partkey FROM (
        |  SELECT l_orderkey, l_partkey, row_number() OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS rn
        |  FROM lineitem)
        |WHERE rn = 1""".stripMargin,

    "w3_global_sort" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "w5_latest_run" ->
      """SELECT event_id, CAST(ts AS DATE) AS event_date FROM events
        |ORDER BY epoch_us(ts) DESC, event_id DESC LIMIT 1""".stripMargin,

    "s2_union_dedup" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
        |  SELECT DISTINCT o_orderkey, o_orderstatus, o_totalprice FROM (
        |    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'
        |    UNION ALL
        |    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 100000))""".stripMargin,

    "j2_cache_lookup" ->
      """SELECT c.c_custkey,
        |  coalesce(k.cached_label, 'MISS') AS label
        |FROM customer c LEFT JOIN (
        |  SELECT c_custkey AS k, 'seg_' || (c_custkey % 3) AS cached_label
        |  FROM customer WHERE c_custkey % 7 = 0) k
        |ON c.c_custkey = k.k""".stripMargin,

    "j4_anti_join" ->
      """SELECT l_returnflag, COUNT(*) AS n_lines FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_orderkey = l.l_orderkey AND o.o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag""".stripMargin,

    "j5_explode_roundtrip" ->
      "SELECT l_orderkey, l_linenumber AS ln FROM lineitem",

    "a17_rolling_avg" -> """
      |WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS daily_total
      |  FROM events GROUP BY 1)
      |SELECT CAST(day AS VARCHAR) AS day, daily_total,
      |  round(AVG(daily_total) OVER (
      |    ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS rolling_avg
      |FROM daily""".stripMargin,

    "j6_full_outer_audit" -> """
      |SELECT
      |  CAST(SUM(CASE WHEN b.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_open,
      |  CAST(SUM(CASE WHEN a.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_big,
      |  CAST(SUM(CASE WHEN a.o_orderkey IS NOT NULL AND b.k IS NOT NULL
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_both
      |FROM (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O') a
      |FULL OUTER JOIN (SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 100000) b
      |ON a.o_orderkey = b.k""".stripMargin,

    "a18_unpivot" -> """
      |WITH m AS (
      |  SELECT o_orderpriority,
      |    CAST(COUNT(*) AS DOUBLE) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |  FROM orders GROUP BY 1)
      |SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM m
      |UNION ALL
      |SELECT o_orderpriority, 'revenue' AS metric, revenue AS value FROM m""".stripMargin,

    "a19_pivot" -> """
      |SELECT c_nationkey,
      |  CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS "AUTOMOBILE",
      |  CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS "BUILDING",
      |  CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS "FURNITURE",
      |  CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS BIGINT) AS "HOUSEHOLD",
      |  CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS "MACHINERY"
      |FROM customer GROUP BY c_nationkey""".stripMargin,

    "stream_enrich_join" -> """
      |SELECT c_mktsegment, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1""".stripMargin,

    "a21_rollup" -> """
      |SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,

    "a22_cube" -> """
      |SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "a23_ntile_buckets" -> """
      |WITH r AS (
      |  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p,
      |    ntile(8) OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2)),
      |      o_orderkey) AS bucket
      |  FROM orders)
      |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(MIN(p) AS DOUBLE) AS min_price,
      |  CAST(MAX(p) AS DOUBLE) AS max_price
      |FROM r GROUP BY 1""".stripMargin,

    "a24_corr" -> """
      |WITH m AS (
      |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))
      |      * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))
      |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, n,
      |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
      |    AS corr_qty_price
      |FROM m""".stripMargin,

    "a25_regression" -> """
      |WITH m AS (
      |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))
      |      * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))
      |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
      |  FROM lineitem GROUP BY 1),
      |s AS (
      |  SELECT l_returnflag, n,
      |    round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS slope,
      |    CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
      |  FROM m)
      |SELECT l_returnflag, n, slope,
      |  round((syd - slope * sxd) / CAST(n AS DOUBLE), 9) AS intercept
      |FROM s""".stripMargin,

    "a26_winsorize" -> """
      |WITH li AS (
      |  SELECT l_returnflag, l_orderkey, l_linenumber,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS x
      |  FROM lineitem),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY x, l_orderkey, l_linenumber) AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
      |  FROM li),
      |b AS (
      |  SELECT l_returnflag, MIN(x) AS lo, MAX(x) AS hi
      |  FROM r
      |  WHERE rn = CAST(ceil(cnt * 0.05) AS INT)
      |     OR rn = CAST(ceil(cnt * 0.95) AS INT)
      |  GROUP BY 1)
      |SELECT li.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MAX(lo) AS DOUBLE) AS p05, CAST(MAX(hi) AS DOUBLE) AS p95,
      |  -- CASE, not least/greatest: DuckDB's least/greatest on
      |  -- decimals returns DOUBLE, losing the exact sum
      |  CAST(SUM(CASE WHEN x < lo THEN lo WHEN x > hi THEN hi ELSE x END)
      |    AS DOUBLE) AS winsorized_sum
      |FROM li JOIN b ON li.l_returnflag = b.l_returnflag
      |GROUP BY 1""".stripMargin,

    "a27_ab_stats" -> """
      |WITH m AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    SUM(CASE WHEN o_orderpriority = '1-URGENT'
      |        THEN CAST(o_totalprice AS DECIMAL(18,2))
      |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS sx1,
      |    SUM(CASE WHEN o_orderpriority = '1-URGENT'
      |        THEN CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))
      |        ELSE CAST(0 AS DECIMAL(36,4)) END) AS sxx1,
      |    CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    SUM(CASE WHEN o_orderpriority = '5-LOW'
      |        THEN CAST(o_totalprice AS DECIMAL(18,2))
      |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS sx2,
      |    SUM(CASE WHEN o_orderpriority = '5-LOW'
      |        THEN CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))
      |        ELSE CAST(0 AS DECIMAL(36,4)) END) AS sxx2
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      |f AS (
      |  SELECT n1, n2,
      |    CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
      |    CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
      |    ((CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)
      |        / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1))
      |      / CAST(n1 AS DOUBLE) AS se1,
      |    ((CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE)
      |        / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1))
      |      / CAST(n2 AS DOUBLE) AS se2
      |  FROM m)
      |SELECT n1, n2, round(m1 - m2, 6) AS mean_diff,
      |  round((m1 - m2) / sqrt(se1 + se2), 9) AS t_stat,
      |  round((se1 + se2) * (se1 + se2)
      |    / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1)
      |      + se2 * se2 / (CAST(n2 AS DOUBLE) - 1)), 3) AS df_welch
      |FROM f""".stripMargin,

    "j7_semi_join" -> """
      |SELECT o_orderkey, o_totalprice FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)""".stripMargin,

    "s16_set_ops" -> """
      |WITH open AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
      |big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
      |SELECT o_custkey, 'both' AS set_kind FROM (
      |  SELECT o_custkey FROM open INTERSECT SELECT o_custkey FROM big)
      |UNION ALL
      |SELECT o_custkey, 'open_only' AS set_kind FROM (
      |  SELECT o_custkey FROM open EXCEPT SELECT o_custkey FROM big)""".stripMargin,

    // DuckDB 1.0 has no width_bucket; replay PG semantics with
    // identical fp steps (width = (500-0)/10 = 50.0 exact, then
    // floor((v - 0)/50) + 1 — the same division Spark computes),
    // INCLUDING the out-of-range clamps: v < lo → 0, v ≥ hi → n+1
    // (sf0.1 has values past 500, which caught an unclamped oracle).
    "a20_histogram" -> """
      |SELECT CASE WHEN value < 0.0 THEN 0
      |            WHEN value >= 500.0 THEN 11
      |            ELSE CAST(FLOOR((value - 0.0) / 50.0) AS BIGINT) + 1 END AS bucket,
      |  COUNT(*) AS n
      |FROM events GROUP BY 1""".stripMargin,

    "merge_upsert" -> """
      |WITH base AS (
      |  SELECT c_custkey, c_name, c_acctbal, 0 AS seq, 'U' AS op FROM customer),
      |chg AS (
      |  SELECT c_custkey, c_name, round(c_acctbal + 1000.0, 2) AS c_acctbal,
      |    1 AS seq, CASE WHEN c_custkey % 20 = 0 THEN 'D' ELSE 'U' END AS op
      |  FROM customer WHERE c_custkey % 10 = 0),
      |u AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
      |r AS (SELECT *, row_number() OVER (
      |        PARTITION BY c_custkey ORDER BY seq DESC) AS rn FROM u)
      |SELECT c_custkey, c_name, c_acctbal FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin,
  )
}
