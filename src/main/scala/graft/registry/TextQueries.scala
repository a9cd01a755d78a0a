package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextAnalysis

/** Text-analysis extension family over `documents`. */
object TextQueries extends QueryRegistry {

  // Bodies shared by the full form (whole corpus) and its `_sampled`
  // scale twin (the 1/DocSampleMod hash slice): one spec of the
  // operator, two input fixtures — so the sampled twin can never
  // drift from the full form it certifies at replica scale.
  private def langidOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), TextAnalysis.langId(col("text")).as("predicted_lang"))

  private def qualityOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))

  private def repetitionOf(d: DataFrame): DataFrame = {
    // r14: hashed windows instead of shingle strings — counts are
    // identical (distinct hash count == distinct shingle count up to
    // the same in-doc xxhash64 collision odds every dedup path already
    // accepts), and the two array passes skip per-window string builds
    val sh = graft.functions.GraftFunctions.shingleHashes(
      TextAnalysis.tokens(col("text")), 3)
    d.select(
      col("doc_id"),
      size(sh).cast("long").as("n_shingles"),
      size(array_distinct(sh)).cast("long").as("n_distinct"))
      .withColumn("repetition",
        round(lit(1.0) -
          col("n_distinct") / greatest(col("n_shingles").cast("double"), lit(1.0)),
          6))
  }

  private def chunksOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      posexplode(TextAnalysis.chunks(col("text"), maxTokens = 64, overlap = 8)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("col.token_start").cast("long").as("token_start"),
        col("col.n_tokens").cast("long").as("n_tokens"),
        col("col.chunk_text").as("chunk_text"))

  private def statsOf(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    // r14: tokenize once per row — langId + tokenCount + qualityScore
    // re-split the document ~8 times through their own tokens() calls
    d.select(col("text"), TextAnalysis.tokens(col("text")).as("_toks"))
      .select(
        TextAnalysis.langIdOf(col("_toks")).as("lang_pred"),
        size(col("_toks")).as("ntok"),
        TextAnalysis.qualityScoreOf(col("text"), col("_toks")).as("q"))
      .groupBy(col("lang_pred"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("total_tokens"),
        round(sum(col("q").cast(DecimalType(18, 6))).cast(DoubleType) /
          count(lit(1)), 6).as("mean_quality"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_langid" -> ((s, dir) => langidOf(Tables.documents(s, dir))),

    // the same classifier over the 1/DocSampleMod hash slice — the
    // scale-record twin (the full per-doc replay is oracle-side hours
    // at replica scale; the slice keeps the complete stopword-vote
    // chain under a tractable full twin at any corpus size).
    "text_langid_sampled" -> ((s, dir) =>
      langidOf(ScaleDedupQueries.docsSliced(s, dir))),

    "text_quality" -> ((s, dir) => qualityOf(Tables.documents(s, dir))),

    // hash-slice scale twin of the quality score.
    "text_quality_sampled" -> ((s, dir) =>
      qualityOf(ScaleDedupQueries.docsSliced(s, dir))),

    "text_tokens" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).as("n_subwords"))),

    "text_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))),

    // rolling-hash winnowing fingerprints — rows-only (xxhash64 has no
    // DuckDB twin); substring-sharing guarantee pinned by spec.
    "text_winnow_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(TextAnalysis.winnowFingerprints(col("text"))).as("n_fingerprints"))),

    // the same XXH64 winnowing over the deterministic
    // 1/ScaleDedupQueries.DocSampleMod hash slice — the scale-record
    // twin that stays DuckDB-tractable at replica scale (the full
    // replay is oracle-side intractable there; this keeps the complete
    // shingle→window-min→distinct chain under a real hash check).
    "text_winnow_sampled" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(pmod(xxhash64(col("doc_id")),
          lit(ScaleDedupQueries.docMod(s, dir))) === 0)
        .select(
          col("doc_id"),
          size(TextAnalysis.winnowFingerprints(col("text"))).as("n_fingerprints"))),

    // context-window chunking: one row per (doc, chunk), 64-token
    // windows advancing by 56 (8-token overlap).
    "corpus_chunk" -> ((s, dir) => chunksOf(Tables.documents(s, dir))),

    // hash-slice scale twin of the chunker (the full twin's
    // generate_series explode over every doc is oracle-side hours at
    // replica scale).
    "corpus_chunk_sampled" -> ((s, dir) =>
      chunksOf(ScaleDedupQueries.docsSliced(s, dir))),

    // greedy sequence packing: per-language prefix-sum bins of an
    // 8192-token budget — the batch-construction step before
    // tokenization. The running sum is sequential per lang BY
    // SEMANTICS (each bin depends on every earlier doc), so this form
    // puts one lang in one task — kept as the exact small-corpus twin;
    // corpus_pack_sharded below is the scale path.
    "corpus_pack_bins" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("ntok"))
        .withColumn("bin_id",
          floor((sum(col("ntok")).over(w) - col("ntok")) / 8192).cast("long"))
    }),

    // sharded packing — the 100 TB form: the window partitions by
    // (lang, doc_id-range shard) so packing runs one task per SHARD,
    // not per language; bins never span shards (≤1 underfilled bin
    // per shard is the entire cost).
    "corpus_pack_sharded" -> ((s, dir) =>
      TextAnalysis.packBinsSharded(Tables.documents(s, dir),
        "doc_id", "lang", "text", tokenBudget = 8192, shardRows = 100)),

    // the materialized pack: one row per (lang, shard, bin) with the
    // concatenated training sequence (as a digest — payloads are
    // opaque blobs downstream), doc count and token total. Group-local
    // sort inside the agg, deterministic by doc_id.
    "corpus_pack_payload" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"), col("shard"))
        .orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("text"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("ntok"))
        .withColumn("shard", floor(col("doc_id") / 100).cast("long"))
        .withColumn("bin_id",
          floor((sum(col("ntok")).over(w) - col("ntok")) / 8192).cast("long"))
        .groupBy(col("lang"), col("shard"), col("bin_id"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("ntok")).as("total_tokens"),
          md5(concat_ws(" ",
            transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
              x => x.getField("text"))).cast("binary")).as("payload_md5"))
    }),

    // winnowing with md5 rolling hashes — the oracle-checkable twin of
    // text_winnow_fingerprint (lexicographic min = numeric min on hex).
    "text_winnow_md5" -> ((s, dir) => {
      val fps = TextAnalysis.winnowFingerprintsMd5(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(fps).as("n_fingerprints"),
        try_element_at(fps, lit(1)).as("min_fp"),
        try_element_at(fps, size(fps)).as("max_fp"))
    }),

    // reproducible hash-range train/val split (~90% train).
    "split_train_val" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"), TextAnalysis.hashSplit(col("doc_id")).as("split"))),

    // corpus reporting: per-language doc counts, token volume, mean
    // quality — the dataset card a training pipeline emits. Sums go
    // through decimal casts so the stats are partitioning-independent.
    "corpus_stats" -> ((s, dir) => statsOf(Tables.documents(s, dir))),

    // the dataset card over the hash slice — the scale-record twin
    // (COMPLETE langid+quality+token chain, sliced corpus coverage).
    "corpus_stats_sampled" -> ((s, dir) =>
      statsOf(ScaleDedupQueries.docsSliced(s, dir))),

    // the dataset card: per-source counts, token volume, mean quality,
    // and a deterministic id sample (HashSampleK) — what a curator
    // publishes next to a training corpus.
    "corpus_report" -> ((s, dir) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("ntok"),
          TextAnalysis.qualityScore(col("text")).as("q"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("ntok")).as("total_tokens"),
          round(sum(col("q").cast(DecimalType(18, 6))).cast(DoubleType) /
            count(lit(1)), 6).as("mean_quality"),
          concat_ws(",",
            graft.functions.GraftFunctions.sampleK(col("doc_id").cast("string"), 3))
            .as("sample_doc_ids"))
    }),

    // vocabulary build + OOV rate: vocab = 100 most frequent terms
    // (count desc, term asc — deterministic), OOV per doc = share of
    // token occurrences outside it — the tokenizer-coverage number a
    // vocab build reports. Vocab is tiny by construction → broadcast
    // join against the token stream.
    "text_vocab_oov" -> ((s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      val vocab = tok.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term").asc).limit(100)
        .select(col("term"), lit(1).as("in_vocab"))
      tok.join(broadcast(vocab), Seq("term"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1).otherwise(0)).cast("long").as("n_oov"))
        .withColumn("oov_rate",
          round(col("n_oov") / col("n_tokens").cast("double"), 6))
    }),

    // tf-idf per (source, term): one explode + two hash aggregations +
    // one equi-join on term. The corpus-wide source count is a driver
    // scalar (two-phase: tiny stats job → literal), NOT a 1-row join —
    // a scalar-subquery shape would plan a nested loop.
    "text_tfidf" -> ((s, dir) => {
      val nSources = Tables.documents(s, dir)
        .select(col("source")).distinct().count()
      val tf = Tables.documents(s, dir)
        .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy(col("source"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      tf.filter(col("tf") >= 3)
        .join(docFreq, "term")
        .select(col("source"), col("term"), col("tf"), col("df"),
          round(col("tf") * log(lit(nSources.toDouble) / col("df")), 5).as("tfidf"))
    }),

    // boilerplate/repetition signal (Gopher-style): share of repeated
    // 3-gram shingles per doc. Pure column math in the scan.
    "text_repetition" -> ((s, dir) => repetitionOf(Tables.documents(s, dir))),

    // hash-slice scale twin of the repetition signal.
    "text_repetition_sampled" -> ((s, dir) =>
      repetitionOf(ScaleDedupQueries.docsSliced(s, dir))),

    // PII scrubbing — the redaction pass a training pipeline runs
    // before tokenization. PII is seeded deterministically (every 5th
    // doc gains an email/URL/phone) so the scrub is observable; counts
    // are measured on the seeded text, replacements run in the scan.
    "text_scrub_pii" -> ((s, dir) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val urlRe = "https?://[^\\s]+"
      val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
      val seeded = when(col("doc_id") % 5 === 0,
        concat(col("text"),
          lit(" reach user"), col("doc_id"), lit("@example.com"),
          lit(" via https://ex.example/"), col("doc_id"),
          lit(" or 555-123-4567"))).otherwise(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(seeded,
          emailRe, "<EMAIL>"), urlRe, "<URL>"), phoneRe, "<PHONE>")
          .as("text_scrubbed"),
        regexp_count(seeded, lit(emailRe)).as("n_email"),
        regexp_count(seeded, lit(urlRe)).as("n_url"),
        regexp_count(seeded, lit(phoneRe)).as("n_phone"))
    }),

    // quantile-based quality gate, shard-parallel like the packer:
    // keep the top half by quality within each (lang, doc_id-range
    // shard) — percent_rank is pure integer arithmetic (deterministic
    // across engines, unlike interpolated medians), and the shard key
    // keeps the window one-task-per-shard at corpus scale (a per-shard
    // median approximates the language median with bounded shards).
    "corpus_quality_filter" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"), col("shard"))
        .orderBy(col("quality").desc, col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .withColumn("shard", floor(col("doc_id") / 100).cast("long"))
        .withColumn("q_rank", round(percent_rank().over(w), 6))
        .filter(col("q_rank") <= 0.5)
    }),

    // stratified source rebalancing: deterministic hash sampling with a
    // per-source fraction (even sources keep ~50%, odd ~25%) — the
    // downweight-overrepresented-sources step of corpus assembly. No
    // shuffle, no sampling state; a doc's fate never changes on re-run.
    "corpus_sample_stratified" -> ((s, dir) => {
      val thr = when(
        regexp_extract(col("source"), "(\\d+)$", 1).cast("int") % 2 === 0,
        lit("7fffffff")).otherwise(lit("3fffffff"))
      Tables.documents(s, dir)
        .filter(md5(concat(col("source"), lit(":"), col("doc_id").cast("string"))
          .cast("binary")) < thr)
        .select(col("doc_id"), col("source"))
    }),

    // A12 composition at scale: top terms per source via explode +
    // count + the native partial/final top-k (only <=5 term rows per
    // source per partition reach the final exchange).
    "text_top_terms" -> ((s, dir) => {
      val counts = Tables.documents(s, dir)
        .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy(col("source"), col("term"))
        .agg(count(lit(1)).as("cnt"))
      graft.plans.TopK.perKey(counts,
          Seq(col("source")), Seq(col("cnt").desc, col("term").asc), k = 5)
        .withColumnRenamed("rank", "rnk")
    }),
  )

  // shared with ScaleDedupQueries' corpus_prep oracle — both SQL twins
  // must express the same quality/langid spec, so they reference one
  // fragment.
  private[registry] def hits(lang: String): String = {
    val words = TextAnalysis.LangStopwords.toMap.apply(lang)
      .map(w => s"'$w'").mkString(",")
    s"len(list_intersect(string_split_regex(lower(trim(text)), '\\s+'), [$words]))"
  }

  private[registry] val langCase: String = {
    val langs = TextAnalysis.LangStopwords.map(_._1)
    val branches = langs.map { l =>
      val geqAll = langs.filter(_ != l)
        .map(o => s"${hits(l)} >= ${hits(o)}").mkString(" AND ")
      s"WHEN $geqAll AND ${hits(l)} > 0 THEN '$l'"
    }.mkString(" ")
    s"CASE $branches ELSE 'und' END"
  }

  // Twin bodies parametrized by the source relation — `documents` for
  // the full form, the `docs` hash-slice CTE for the `_sampled` twin —
  // so both forms replay the SAME spec text.
  private def qualityChain(src: String): String = s"""
    |t AS (SELECT doc_id,
    |  CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS ntok,
    |  CAST(length(text) AS DOUBLE) AS nchars,
    |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
    |  CAST(${hits("en")} AS DOUBLE) AS h
    |FROM $src)
    |SELECT doc_id, round(
    |  least(ntok / 100.0, 1.0) * 0.3 +
    |  (CASE WHEN nchars / greatest(ntok, 1.0) BETWEEN 3.0 AND 10.0
    |        THEN 1.0 ELSE 0.3 END) * 0.2 +
    |  alpha / greatest(nchars, 1.0) * 0.3 +
    |  least(h / 3.0, 1.0) * 0.2, 6) AS quality
    |FROM t""".stripMargin

  private def chunkChain(src: String): String = s"""
    |tok AS (
    |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
    |  FROM $src),
    |n AS (
    |  SELECT doc_id, t,
    |    greatest(CAST(ceil((len(t) - 8) / 56.0) AS INT), 1) AS nchunks
    |  FROM tok)
    |SELECT doc_id,
    |  i AS chunk_id,
    |  i * 56 AS token_start,
    |  least(64, len(t) - i * 56) AS n_tokens,
    |  array_to_string(list_slice(t, i * 56 + 1, i * 56 + 64), ' ') AS chunk_text
    |FROM n, unnest(generate_series(0, nchunks - 1)) AS u(i)""".stripMargin

  private def statsChain(src: String): String = s"""
    |scored AS (
    |  SELECT $langCase AS lang_pred,
    |    len(string_split_regex(lower(trim(text)), '\\s+')) AS ntok,
    |    (SELECT round(
    |      least(CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) / 100.0, 1.0) * 0.3 +
    |      (CASE WHEN CAST(length(text) AS DOUBLE) /
    |              greatest(CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE), 1.0)
    |              BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.3 END) * 0.2 +
    |      CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) /
    |        greatest(CAST(length(text) AS DOUBLE), 1.0) * 0.3 +
    |      least(CAST(${hits("en")} AS DOUBLE) / 3.0, 1.0) * 0.2, 6)) AS q
    |  FROM $src)
    |SELECT lang_pred, COUNT(*) AS n_docs,
    |  CAST(SUM(ntok) AS BIGINT) AS total_tokens,
    |  round(CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_quality
    |FROM scored GROUP BY lang_pred""".stripMargin

  private def repetitionChain(src: String): String = s"""
    |t AS (
    |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
    |  FROM $src),
    |s AS (
    |  SELECT doc_id,
    |    CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
    |         ELSE list_transform(generate_series(1, len(tk) - 2),
    |                i -> array_to_string(tk[i:i+2], ' ')) END AS sh
    |  FROM t)
    |SELECT doc_id,
    |  CAST(len(sh) AS BIGINT) AS n_shingles,
    |  CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct,
    |  round(1.0 - len(list_distinct(sh)) / greatest(CAST(len(sh) AS DOUBLE), 1.0), 6)
    |    AS repetition
    |FROM s""".stripMargin

  private val docSlice: String =
    ScaleDedupQueries.docSliceCtes(Seq("doc_id", "text"))

  def oracle: Map[String, String] = Map(
    "text_langid" ->
      s"SELECT doc_id, $langCase AS predicted_lang FROM documents",

    "text_langid_sampled" -> s"""
      |WITH RECURSIVE $docSlice
      |SELECT doc_id, $langCase AS predicted_lang FROM docs""".stripMargin,

    "text_quality" -> s"WITH ${qualityChain("documents")}",

    "text_quality_sampled" ->
      s"WITH RECURSIVE $docSlice,\n${qualityChain("docs")}",

    "text_tokens" -> """
      |SELECT doc_id,
      |  len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_subwords
      |FROM documents""".stripMargin,

    "text_fingerprint" -> """
      |SELECT doc_id,
      |  md5(array_to_string(string_split_regex(lower(trim(text)), '\s+'), ' ')) AS fp
      |FROM documents""".stripMargin,

    "corpus_chunk" -> s"WITH ${chunkChain("documents")}",

    "corpus_chunk_sampled" ->
      s"WITH RECURSIVE $docSlice,\n${chunkChain("docs")}",

    "corpus_pack_bins" -> """
      |SELECT doc_id, lang,
      |  len(string_split_regex(lower(trim(text)), '\s+')) AS ntok,
      |  CAST(FLOOR((SUM(len(string_split_regex(lower(trim(text)), '\s+')))
      |      OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |    - len(string_split_regex(lower(trim(text)), '\s+'))) / 8192) AS BIGINT) AS bin_id
      |FROM documents""".stripMargin,

    "corpus_pack_sharded" -> """
      |SELECT doc_id, lang,
      |  len(string_split_regex(lower(trim(text)), '\s+')) AS ntok,
      |  CAST(FLOOR(doc_id / 100) AS BIGINT) AS shard,
      |  CAST(FLOOR((SUM(len(string_split_regex(lower(trim(text)), '\s+')))
      |      OVER (PARTITION BY lang, FLOOR(doc_id / 100)
      |            ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |    - len(string_split_regex(lower(trim(text)), '\s+'))) / 8192) AS BIGINT) AS bin_id
      |FROM documents""".stripMargin,

    "corpus_pack_payload" -> """
      |WITH b AS (
      |  SELECT doc_id, lang, text,
      |    len(string_split_regex(lower(trim(text)), '\s+')) AS ntok,
      |    CAST(FLOOR(doc_id / 100) AS BIGINT) AS shard,
      |    CAST(FLOOR((SUM(len(string_split_regex(lower(trim(text)), '\s+')))
      |        OVER (PARTITION BY lang, FLOOR(doc_id / 100)
      |              ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |      - len(string_split_regex(lower(trim(text)), '\s+'))) / 8192) AS BIGINT) AS bin_id
      |  FROM documents)
      |SELECT lang, shard, bin_id, COUNT(*) AS n_docs,
      |  CAST(SUM(ntok) AS BIGINT) AS total_tokens,
      |  md5(string_agg(text, ' ' ORDER BY doc_id)) AS payload_md5
      |FROM b GROUP BY 1, 2, 3""".stripMargin,

    // Full XXH64 replay of the scale-path winnowing: positional
    // shingle hashes (seed 42, signed-long numeric min per window —
    // exactly Spark's array_min), distinct fingerprint count per doc;
    // shingle-less docs come back via the left join with 0.
    "text_winnow_fingerprint" -> s"""
      |WITH RECURSIVE tok AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, u.i, array_to_string(t[u.i:u.i+2], ' ') AS s
      |  FROM tok, unnest(generate_series(1, len(t) - 2)) AS u(i)),
      |xxw_src AS MATERIALIZED (
      |  SELECT row_number() OVER () AS xid, s, CAST(42 AS UBIGINT) AS useed,
      |         doc_id, i
      |  FROM pos),
      |${XxHashOracleSql.stringHashCtes("xxw")},
      |hs AS (
      |  SELECT m.doc_id, list(o.hash64 ORDER BY m.i) AS hs
      |  FROM xxw_src m JOIN xxw_out o ON o.xid = m.xid
      |  GROUP BY m.doc_id),
      |fp AS (
      |  SELECT doc_id,
      |    CASE WHEN len(hs) < 4 THEN len(list_distinct(hs))
      |         ELSE len(list_distinct(list_transform(
      |                generate_series(1, len(hs) - 3),
      |                i -> list_min(hs[i:i+3])))) END AS n_fingerprints
      |  FROM hs)
      |SELECT d.doc_id, CAST(coalesce(f.n_fingerprints, 0) AS INT) AS n_fingerprints
      |FROM documents d LEFT JOIN fp f ON f.doc_id = d.doc_id""".stripMargin,

    // identical replay restricted to the xxhash64-sampled slice; the
    // sampling itself is replayed through the longHashCte XXH64 chain
    // so both engines select the same docs bit-for-bit.
    "text_winnow_sampled" -> s"""
      |WITH RECURSIVE ${SampleMod.modCte("documents", ScaleDedupQueries.DocSampleMod)},
      |${XxHashOracleSql.longHashCte("dsel", "documents",
           Seq("doc_id", "text"), "doc_id", "CAST(42 AS UBIGINT)", "h64")},
      |docs AS (
      |  SELECT doc_id, text FROM dsel
      |  WHERE ${SampleMod.slicePredicate("h64")}),
      |tok AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      |  FROM docs),
      |pos AS (
      |  SELECT doc_id, u.i, array_to_string(t[u.i:u.i+2], ' ') AS s
      |  FROM tok, unnest(generate_series(1, len(t) - 2)) AS u(i)),
      |xxw_src AS MATERIALIZED (
      |  SELECT row_number() OVER () AS xid, s, CAST(42 AS UBIGINT) AS useed,
      |         doc_id, i
      |  FROM pos),
      |${XxHashOracleSql.stringHashCtes("xxw")},
      |hs AS (
      |  SELECT m.doc_id, list(o.hash64 ORDER BY m.i) AS hs
      |  FROM xxw_src m JOIN xxw_out o ON o.xid = m.xid
      |  GROUP BY m.doc_id),
      |fp AS (
      |  SELECT doc_id,
      |    CASE WHEN len(hs) < 4 THEN len(list_distinct(hs))
      |         ELSE len(list_distinct(list_transform(
      |                generate_series(1, len(hs) - 3),
      |                i -> list_min(hs[i:i+3])))) END AS n_fingerprints
      |  FROM hs)
      |SELECT d.doc_id, CAST(coalesce(f.n_fingerprints, 0) AS INT) AS n_fingerprints
      |FROM docs d LEFT JOIN fp f ON f.doc_id = d.doc_id""".stripMargin,

    "text_winnow_md5" -> """
      |WITH tok AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      |  FROM documents),
      |h AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
      |         ELSE list_transform(generate_series(1, len(t) - 2),
      |                i -> md5(array_to_string(t[i:i+2], ' '))) END AS hs
      |  FROM tok),
      |fp AS (
      |  SELECT doc_id,
      |    CASE WHEN len(hs) < 4 THEN list_sort(list_distinct(hs))
      |         ELSE list_sort(list_distinct(list_transform(
      |                generate_series(1, len(hs) - 3),
      |                i -> list_min(hs[i:i+3])))) END AS fps
      |  FROM h)
      |SELECT doc_id, len(fps) AS n_fingerprints,
      |  fps[1] AS min_fp, fps[len(fps)] AS max_fp
      |FROM fp""".stripMargin,

    "split_train_val" -> """
      |SELECT doc_id,
      |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6666666'
      |       THEN 'train' ELSE 'val' END AS split
      |FROM documents""".stripMargin,

    "corpus_stats" -> s"WITH ${statsChain("documents")}",

    "corpus_stats_sampled" ->
      s"WITH RECURSIVE $docSlice,\n${statsChain("docs")}",

    "corpus_report" -> s"""
      |WITH scored AS (
      |  SELECT source, doc_id,
      |    len(string_split_regex(lower(trim(text)), '\\s+')) AS ntok,
      |    round(
      |      least(CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) / 100.0, 1.0) * 0.3 +
      |      (CASE WHEN CAST(length(text) AS DOUBLE) /
      |              greatest(CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE), 1.0)
      |              BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.3 END) * 0.2 +
      |      CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) /
      |        greatest(CAST(length(text) AS DOUBLE), 1.0) * 0.3 +
      |      least(CAST(${hits("en")} AS DOUBLE) / 3.0, 1.0) * 0.2, 6) AS q
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(ntok) AS BIGINT) AS total_tokens,
      |  round(CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_quality,
      |  array_to_string(
      |    list_transform(
      |      list_slice(list_sort(list({'h': md5(CAST(doc_id AS VARCHAR)),
      |                                 'v': CAST(doc_id AS VARCHAR)})), 1, 3),
      |      x -> x.v), ',') AS sample_doc_ids
      |FROM scored GROUP BY source""".stripMargin,

    "text_vocab_oov" -> """
      |WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
      |  FROM documents),
      |v AS (
      |  SELECT term FROM (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY 1)
      |  ORDER BY cnt DESC, term LIMIT 100)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(CASE WHEN term IN (SELECT term FROM v) THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
      |  round(CAST(SUM(CASE WHEN term IN (SELECT term FROM v) THEN 0 ELSE 1 END) AS DOUBLE)
      |    / COUNT(*), 6) AS oov_rate
      |FROM tok GROUP BY doc_id""".stripMargin,

    "text_tfidf" -> """
      |WITH tok AS (
      |  SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT source, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS n FROM documents)
      |SELECT source, term, tf, df,
      |  round(tf * ln((SELECT n FROM n) / df), 5) AS tfidf
      |FROM tf JOIN df USING (term) WHERE tf >= 3""".stripMargin,

    "text_repetition" -> s"WITH ${repetitionChain("documents")}",

    "text_repetition_sampled" ->
      s"WITH RECURSIVE $docSlice,\n${repetitionChain("docs")}",

    "text_scrub_pii" -> """
      |WITH seeded AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0
      |         THEN text || ' reach user' || doc_id || '@example.com' ||
      |              ' via https://ex.example/' || doc_id || ' or 555-123-4567'
      |         ELSE text END AS t
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_replace(regexp_replace(regexp_replace(t,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    'https?://[^\s]+', '<URL>', 'g'),
      |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS text_scrubbed,
      |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
      |  len(regexp_extract_all(t, 'https?://[^\s]+')) AS n_url,
      |  len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phone
      |FROM seeded""".stripMargin,

    "corpus_quality_filter" -> s"""
      |WITH scored AS (
      |  SELECT doc_id, lang,
      |    round(
      |      least(CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) / 100.0, 1.0) * 0.3 +
      |      (CASE WHEN CAST(length(text) AS DOUBLE) /
      |              greatest(CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE), 1.0)
      |              BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.3 END) * 0.2 +
      |      CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) /
      |        greatest(CAST(length(text) AS DOUBLE), 1.0) * 0.3 +
      |      least(CAST(${hits("en")} AS DOUBLE) / 3.0, 1.0) * 0.2, 6) AS quality,
      |    CAST(FLOOR(doc_id / 100) AS BIGINT) AS shard
      |  FROM documents),
      |r AS (
      |  SELECT *, round(percent_rank() OVER (
      |    PARTITION BY lang, shard ORDER BY quality DESC, doc_id), 6) AS q_rank
      |  FROM scored)
      |SELECT doc_id, lang, quality, shard, q_rank FROM r WHERE q_rank <= 0.5""".stripMargin,

    "corpus_sample_stratified" -> """
      |SELECT doc_id, source FROM documents
      |WHERE md5(source || ':' || CAST(doc_id AS VARCHAR)) <
      |  CASE WHEN CAST(regexp_extract(source, '(\d+)$', 1) AS INT) % 2 = 0
      |       THEN '7fffffff' ELSE '3fffffff' END""".stripMargin,

    "text_top_terms" -> """
      |WITH tok AS (
      |  SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
      |  FROM documents),
      |counts AS (
      |  SELECT source, term, COUNT(*) AS cnt FROM tok GROUP BY source, term),
      |ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY source ORDER BY cnt DESC, term) AS rnk
      |  FROM counts)
      |SELECT source, term, cnt, rnk FROM ranked WHERE rnk <= 5""".stripMargin,
  )
}
