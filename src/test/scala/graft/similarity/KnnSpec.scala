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
