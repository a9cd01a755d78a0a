package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class KnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = Tables.embeddings(spark, TestSpark.SfDir)
  private lazy val queries = emb.filter(col("vec_id") < 10)

  test("brute-force top-k: k rows per query, ranked desc, self excluded") {
    val r = Knn.bruteForceTopK(queries, emb, k = 5).collect()
    val byQuery = r.groupBy(_.getLong(0))
    assert(byQuery.size === 10)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length === 5)
      assert(!rows.exists(_.getLong(1) == q), s"self in results for $q")
      val sims = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.sameElements(sims.sortBy(-(_: Double))), s"not desc for $q")
    }
  }

  test("LSH top-k returns only true-cosine-ranked co-bucketed candidates") {
    val brute = Knn.bruteForceTopK(queries, emb, k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // sims in LSH results equal the exact cosine (it's exact within bucket)
    val lshPairs = Knn.lshTopK(emb, queries, dim = 64, nPlanes = 8, k = 5)
      .select("query_id", "cand_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    lshPairs.foreach { case (k2, sim) =>
      brute.get(k2).foreach(exact => assert(math.abs(exact - sim) < 1e-9))
    }
  }

  test("LSH recall@5 on self-perturbed vectors is high") {
    import graft.registry.SimilarityQueries
    val perturbed = SimilarityQueries.withPerturbed(spark, TestSpark.SfDir)
    val qs = perturbed.filter(col("vec_id") >= 100000)
    val found = Knn.lshTopK(perturbed, qs, dim = 64, nPlanes = 8, k = 5)
      .filter(col("cand_id") === col("query_id") - 100000).count()
    val total = qs.count()
    // a perturbed copy is nearly identical -> same bucket almost always
    assert(found >= total * 9 / 10, s"recall $found/$total")
  }

  test("IVF recall@5: perturbed copies land in the probed lists") {
    import graft.registry.SimilarityQueries
    val perturbed = SimilarityQueries.withPerturbed(spark, TestSpark.SfDir)
    val qs = perturbed.filter(col("vec_id") >= 100000)
    val found = Knn.ivfTopK(perturbed, qs, nCentroids = 16, nProbe = 4, k = 5)
      .filter(col("cand_id") === col("query_id") - 100000).count()
    val total = qs.count()
    assert(found >= total * 9 / 10, s"IVF recall $found/$total")
  }

  test("IVF results are exact within the probed lists") {
    val brute = Knn.bruteForceTopK(queries, emb, k = 200).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Knn.ivfTopK(emb, queries, nCentroids = 16, nProbe = 4, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(ivf.nonEmpty)
    ivf.foreach { case (key, sim) =>
      brute.get(key).foreach(exact => assert(math.abs(exact - sim) < 1e-9, key))
    }
  }

  // sf0.1 (~5k vectors): large enough that recall against brute force
  // is a meaningful ANN measurement, small enough for test time. All
  // recall numbers below are deterministic — planes and centroid seeds
  // are hash-derived from constants, Lloyd refinement is exact
  // arithmetic — so the thresholds pin actual behavior, not luck.
  private val Sf01 = "/root/testdata/sf0.1"

  test("blocked near-dup pairs equal exact all-pairs (and never cross join)") {
    import graft.registry.SimilarityQueries
    val vecs = SimilarityQueries.withPerturbed(spark, TestSpark.SfDir)
    val exact = Knn.cosineNearDupPairs(vecs, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = Knn.cosineNearDupPairsBlocked(vecs, dim = 64,
      threshold = 0.99, nPlanes = 8, nTables = 4)
    val got = blocked.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === exact, "blocked result differs from exact all-pairs")
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"blocked near-dup plan still contains an all-pairs join:\n$plan")
  }

  test("multi-table LSH raises recall vs brute force (>=0.8 at 3 planes x 8 tables)") {
    val emb01 = Tables.embeddings(spark, Sf01)
    val qs = emb01.filter(col("vec_id") < 20)
    val brute = Knn.bruteForceTopK(qs, emb01, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nPlanes: Int, nTables: Int): Int =
      brute.intersect(Knn.lshTopK(emb01, qs, 64, nPlanes, 5, nTables)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet).size
    val one = recall(3, 1)
    val eight = recall(3, 8)
    assert(eight > one, s"extra tables did not raise recall ($one -> $eight)")
    assert(eight * 10 >= brute.size * 8, s"recall $eight/${brute.size} < 0.8")
  }

  test("PQ/ADC recall >=0.9 vs brute force; re-rank sims are exact") {
    val emb01 = Tables.embeddings(spark, Sf01)
    val qs = emb01.filter(col("vec_id") < 20)
    val brute = Knn.bruteForceTopK(qs, emb01, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pq = Knn.pqTopK(emb01, qs, dim = 64, m = 16, kCode = 32, k = 5,
      lloydIters = 2, rerankFactor = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    val found = pq.count { case (key, _) => brute.contains(key) }
    assert(found * 10 >= brute.size * 9, s"PQ recall $found/${brute.size} < 0.9")
    // the re-rank stage recomputes EXACT cosines — any surviving true
    // neighbor must carry the same sim as brute force
    pq.foreach { case (key, sim) =>
      brute.get(key).foreach(exact => assert(math.abs(exact - sim) < 1e-9, key))
    }
  }

  test("IVF-PQ recall >=0.8 vs brute force; re-rank sims are exact") {
    val emb01 = Tables.embeddings(spark, Sf01)
    val qs = emb01.filter(col("vec_id") < 20)
    val brute = Knn.bruteForceTopK(qs, emb01, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // nProbe=12 of 16 matches the IVF spec's measured 0.94 list
    // coverage; measured composed recall: 0.77 at nProbe=8 (list
    // coverage binds), above the 0.8 floor at 12
    val ivfpq = Knn.ivfPqTopK(emb01, qs, dim = 64, nCentroids = 16,
      nProbe = 12, m = 16, kCode = 32, k = 5, lloydIters = 1,
      rerankFactor = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    // the list filter bounds recall by the IVF probe stage (a true
    // neighbor outside the probed lists is unreachable by design), so
    // the composed floor sits under flat PQ's 0.9
    val found = ivfpq.count { case (key, _) => brute.contains(key) }
    assert(found * 10 >= brute.size * 8, s"IVF-PQ recall $found/${brute.size} < 0.8")
    ivfpq.foreach { case (key, sim) =>
      brute.get(key).foreach(exact => assert(math.abs(exact - sim) < 1e-9, key))
    }
  }

  test("IVF multi-probe recall >=0.9 vs brute force; Lloyd refinement helps") {
    val emb01 = Tables.embeddings(spark, Sf01)
    val qs = emb01.filter(col("vec_id") < 20)
    val brute = Knn.bruteForceTopK(qs, emb01, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nc: Int, np: Int, lloyd: Int): Int =
      brute.intersect(Knn.ivfTopK(emb01, qs, nc, np, 5, lloyd)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet).size
    // 12 of 16 lists probed, one Lloyd iteration: measured 94/100
    assert(recall(16, 12, 1) * 10 >= brute.size * 9)
    // finer quantizer (64 lists): Lloyd moves hash-sampled seeds toward
    // true cluster means — measured 80 -> 88 of 100 at nProbe=32
    val r0 = recall(64, 32, 0)
    val r1 = recall(64, 32, 1)
    assert(r1 >= r0, s"Lloyd hurt recall ($r0 -> $r1)")
    assert(r1 * 100 >= brute.size * 85, s"refined recall $r1/${brute.size} < 0.85")
  }

  test("semanticDedup through the distributed-CC fallback equals the driver path") {
    import graft.registry.SimilarityQueries
    val vecs = SimilarityQueries.withPerturbed(spark, TestSpark.SfDir)
    val driver = Knn.semanticDedup(vecs, dim = 64, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fallback = Knn.semanticDedup(vecs, dim = 64, threshold = 0.99,
      driverCcThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fallback === driver)
    // sanity: every perturbed copy collapsed onto its original
    assert(driver.filter(_._1 >= 100000).forall { case (id, c) => c == id - 100000 })
  }

  test("bounded-outlier recall gate: tolerates <=maxBelow one-hit queries, refuses broad degradation") {
    // perfect ANN = the exact top-k itself (hits = 5 everywhere);
    // degrade a chosen set of queries to their rank-1 row only (hits=1)
    val perfect = Knn.bruteForceTopK(queries, emb, k = 5)
    def degraded(victims: Seq[Long]) = perfect.filter(
      col("rank") === 1 || !col("query_id").isInCollection(victims))
    def okCount(ann: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = Knn.recallChecked(ann, queries, emb, k = 5,
        minHits = 2, minTotalHits = 0, maxBelow = 2)
      (r.filter(col("recall_ok")).count(), r.count())
    }
    // 2 one-hit outliers: within the bound — every row stays true
    assert(okCount(degraded(Seq(0L, 1L))) === ((10L, 10L)))
    // 5 one-hit queries: broad degradation — exactly those 5 flip false
    assert(okCount(degraded(Seq(0L, 1L, 2L, 3L, 4L))) === ((5L, 10L)))
    // a zero-hit query is never excused by the outlier bound
    val zeroed = perfect.filter(col("query_id") =!= 7L)
    assert(okCount(zeroed) === ((9L, 10L)))
  }

  test("corpus-derived IVF dials: fixture-identical at small n, sqrt growth, bounded") {
    // At every fixture <= 2k vectors the rules must resolve to exactly
    // the previously pinned (16, 8) — that identity is what keeps all
    // small-tier correctness records value-identical across the r12
    // dial derivation.
    for (n <- Seq(1L, 500L, 2000L)) {
      assert(Knn.autoCentroids(n) === 16, s"n=$n")
      assert(Knn.autoProbe(Knn.autoCentroids(n)) === 8, s"n=$n")
    }
    // The measured decade points (SCALE_100x.md r12 table).
    assert(Knn.autoCentroids(20000L) === 50)
    assert(Knn.autoCentroids(200000L) === 159)
    assert(Knn.autoCentroids(2000000L) === 500)
    assert(Knn.autoProbe(500) === 250)
    // Monotone in n, probed fraction pinned at 1/2, hard cap holds.
    var prev = 0
    for (n <- Seq(1L, 1000L, 10000L, 100000L, 1000000L, 100000000L, 1000000000L)) {
      val nc = Knn.autoCentroids(n)
      assert(nc >= prev && nc <= 4096)
      assert(Knn.autoProbe(nc) === math.max(8, (nc + 1) / 2))
      prev = nc
    }
    assert(Knn.autoCentroids(Long.MaxValue) === 4096)
  }

  test("ivfTopK auto dials (0, 0) equal the explicit fixture dials at fixture scale") {
    // nCentroids = 0 / nProbe = 0 resolve via autoCentroids/autoProbe;
    // at this corpus that is exactly (16, 8), so the result sets must
    // be identical row-for-row — the executable form of the
    // "small-tier records are value-identical" claim.
    val qs = emb.filter(col("vec_id") < 10)
    def rows(nc: Int, np: Int) =
      Knn.ivfTopK(emb, qs, nCentroids = nc, nProbe = np, k = 5)
        .collect().map(_.toSeq).toSet
    assert(rows(0, 0) === rows(16, 8))
  }

  test("cosine of identical vectors is 1.0") {
    val one = Knn.cosineNearDupPairs(
      emb.filter(col("vec_id") < 2)
        .unionByName(emb.filter(col("vec_id") < 2)
          .withColumn("vec_id", col("vec_id") + 10)),
      threshold = 0.999)
    val sims = one.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sims((0L, 10L)) === 1.0)
    assert(sims((1L, 11L)) === 1.0)
  }
}
