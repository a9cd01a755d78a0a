package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Clustering.kmeansAssignTwoLevel]] — the IVF-style scale path
  * for centroid assignment past the flat argmin's n × k wall:
  * exactness at full probe coverage, determinism under partitioning,
  * and total coverage at minimal probe width.
  */
class TwoLevelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Four well-separated blobs on the axes of a 4-d space. */
  private def blobs4 = (0 until 64).map { i =>
    val jitter = (i % 5) * 0.01f
    val e = i % 4 match {
      case 0 => Array(10.0f + jitter, jitter, 0f, 0f)
      case 1 => Array(-10.0f - jitter, jitter, 0f, 0f)
      case 2 => Array(jitter, 10.0f + jitter, 0f, 0f)
      case _ => Array(jitter, -10.0f - jitter, 0f, 0f)
    }
    (i.toLong, e)
  }.toDF("vec_id", "embedding")

  test("full probe coverage reproduces the flat assignment bit-for-bit") {
    // k = 4 -> s = ceil(sqrt(4)) = 2 super-cells; nProbe = 2 probes
    // both, so the member argmin sees every centroid — the result must
    // equal kmeansAssign exactly (same 6-dp keys, same ties).
    val flat = Clustering.kmeansAssign(blobs4, k = 4, iters = 2)
      .orderBy("vec_id").collect().toSeq
    val two = Clustering.kmeansAssignTwoLevel(blobs4, k = 4, iters = 2,
      nProbe = 2).orderBy("vec_id").collect().toSeq
    assert(two === flat, "two-level at full probe width diverged from flat")
  }

  test("assignment is identical across partitioning layouts") {
    val a = Clustering.kmeansAssignTwoLevel(blobs4.repartition(1),
      k = 4, iters = 2, nProbe = 1).orderBy("vec_id").collect().toSeq
    val b = Clustering.kmeansAssignTwoLevel(blobs4.repartition(7),
      k = 4, iters = 2, nProbe = 1).orderBy("vec_id").collect().toSeq
    assert(a === b, "partitioning changed the two-level assignment")
  }

  test("minimal probe width still assigns every vector exactly once") {
    val out = Clustering.kmeansAssignTwoLevel(blobs4, k = 4, iters = 2,
      nProbe = 1)
    assert(out.count() === 64L)
    assert(out.select(countDistinct(col("vec_id"))).as[Long].head() === 64L)
    // well-separated blobs: even nProbe = 1 keeps blob-mates together
    val mixed = out
      .withColumn("blob", col("vec_id") % 4)
      .groupBy(col("cluster"))
      .agg(countDistinct(col("blob")).as("blobs"))
      .select(max(col("blobs"))).as[Long].head()
    assert(mixed === 1L, "a cluster mixed two well-separated blobs")
  }

  test("two-level equals flat on the larger random-ish corpus at full width") {
    // 200 hash-spread vectors, k = 9 -> s = 3, nProbe = 3 (full).
    val vecs = (0 until 200).map { i =>
      val e = Array.tabulate(8)(d =>
        (((i * 31 + d * 17) % 97) / 97.0f) - 0.5f)
      (i.toLong, e)
    }.toDF("vec_id", "embedding")
    val flat = Clustering.kmeansAssign(vecs, k = 9, iters = 2)
      .orderBy("vec_id").collect().toSeq
    val two = Clustering.kmeansAssignTwoLevel(vecs, k = 9, iters = 2,
      nProbe = 3).orderBy("vec_id").collect().toSeq
    assert(two === flat)
  }
}
