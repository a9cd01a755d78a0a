package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.registry.CorpusOpsQueries
import graft.text.TextAnalysis

/** Invariants for the corpus-operations family (the DuckDB twins pin
  * exact values; these pin the algebraic guarantees that must hold at
  * any scale and any partitioning).
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    CorpusOpsQueries.queries(name)(spark, TestSpark.SfDir)

  test("dedup_segments: kept segments are globally unique and exhaustive") {
    val out = run("dedup_segments").cache()
    val docs = Tables.documents(spark, TestSpark.SfDir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))

    // every kept count is within [0, n_segs]
    assert(out.filter(col("n_kept") > col("n_segs") || col("n_kept") < 0).count() == 0)

    // sum of kept == number of distinct segments in the corpus: each
    // distinct segment survives exactly once, nothing is lost
    val nSeg = 20
    val segArr = transform(
      sequence(lit(0), greatest(ceil(size(col("tk")) / lit(nSeg.toDouble)).cast("int") - 1, lit(0))),
      i => array_join(slice(col("tk"), i * nSeg + 1, lit(nSeg)), " "))
    val distinctSegs = docs.select(explode(segArr).as("s")).distinct().count()
    val totalKept = out.agg(sum(col("n_kept"))).head().getLong(0)
    assert(totalKept == distinctSegs, s"kept $totalKept != distinct $distinctSegs")

    // an exact-duplicate doc with a higher doc_id keeps nothing
    val dupPairs = docs.as("a")
      .join(docs.as("b"),
        col("a.tk") === col("b.tk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("b.doc_id").as("doc_id")).distinct()
    val survivors = dupPairs.join(out, "doc_id").filter(col("n_kept") > 0).count()
    assert(survivors == 0, s"$survivors exact-dup docs kept segments")
    out.unpersist()
  }

  test("dedup_segments totals formula == exploded form on null-text docs (r15)") {
    import spark.implicits._
    // A null tk does NOT vanish from the exploded form: the segment
    // array is [null] (sequence(0, greatest(null-1, 0)) = [0], then
    // slice/array_join of null yields one null element), so posexplode
    // emits exactly one row — matching greatest(null, 1) = 1 in the
    // formula. Pins the two forms equal on exactly that input (the
    // r15 advice suggested filtering null tk, which would DIVERGE).
    val segTokens = 20
    val docs = Seq((1L, "alpha beta gamma"), (2L, null), (3L, ""))
      .toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
    val nSeg = ceil(size(col("tk")) / lit(segTokens.toDouble)).cast("int")
    // the registered query's formula fragment
    val formula = toks
      .select(col("doc_id"), greatest(nSeg, lit(1)).cast("long").as("n_segs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exploded reference: count rows per doc out of the same segment array
    val segArr = transform(sequence(lit(0), greatest(nSeg - 1, lit(0))),
      i => array_join(slice(col("tk"), i * segTokens + 1, lit(segTokens)), " "))
    val exploded = toks.select(col("doc_id"), posexplode(segArr))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_segs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(formula === exploded, s"formula=$formula exploded=$exploded")
    assert(formula(2L) === 1L)
  }

  test("ts_gap_fill: grid is complete and forward fill carries the last observation") {
    val out = run("ts_gap_fill")
    val rows = out.orderBy(col("event_type"), col("hour")).collect()

    // complete hourly grid per type: equal row counts, hour step = 1h
    val byType = rows.groupBy(_.getString(0))
    assert(byType.values.map(_.length).toSet.size == 1, "uneven grids per type")
    byType.values.foreach { rs =>
      rs.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getTimestamp(1).getTime - a.getTimestamp(1).getTime == 3600000L)
        case _ =>
      }
      // forward-fill semantics, replayed imperatively
      var last: Option[Double] = None
      rs.foreach { r =>
        val obs = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        val filled = if (r.isNullAt(4)) None else Some(r.getDouble(4))
        obs.foreach(v => last = Some(v))
        assert(filled == last, s"filled $filled != expected $last at $r")
      }
    }
    // silent hours exist in the fixture and carry zero counts
    assert(rows.exists(r => r.getLong(2) == 0L))
  }

  test("text_bm25_topk matches a driver-side brute-force reimplementation") {
    val out = run("text_bm25_topk").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val docs = Tables.documents(spark, TestSpark.SfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase.split("\\s+").toSeq))
    val terms = Seq("spark", "join", "window")
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum.toDouble / n
    val dfm = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val (k1, b) = (1.2, 0.75)
    val scored = docs.map { case (id, tk) =>
      val dl = tk.length.toDouble
      val s = terms.map { t =>
        val tf = tk.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
        idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
      }.reduceLeft(_ + _)
      // Spark's round() goes through BigDecimal.valueOf (shortest
      // decimal repr of the double) — replay exactly that
      (id, java.math.BigDecimal.valueOf(s)
        .setScale(5, java.math.RoundingMode.HALF_UP).doubleValue)
    }.filter(_._2 > 0).sortBy { case (id, sc) => (-sc, id) }.take(20)
    assert(out.toSeq == scored.toSeq)
  }

  test("corpus_profile reports zero nulls and full distincts for the key column") {
    val prof = run("corpus_profile").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nDocs = Tables.documents(spark, TestSpark.SfDir).count()
    assert(prof("doc_id") == ((0L, nDocs)))
    assert(prof.keySet == Set("doc_id", "text", "lang", "source", "n_chars"))
  }
}
