package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exactness baseline: |Q| × |C|
  * comparisons as a broadcast nested loop (queries broadcast, corpus
  * streamed — no shuffle of the corpus). The scale path is
  * random-hyperplane LSH: bucket by sign bits, search only co-bucketed
  * candidates — one equi-join shuffle instead of the cross product,
  * trading recall (multi-probe via several tables restores it).
  */
object Knn {

  /** Dot product of two float-array columns in double precision
    * (index order, so bit-deterministic).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 6 dp (stable ranking key). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Exact top-k neighbors for each query vector (excluding self). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 scaled into [-0.5, 0.5). Seeded by constants only, so
    * every executor regenerates identical planes — no driver state to
    * ship.
    */
  private def planeComponent(plane: Int, d: Column): Column =
    (pmod(xxhash64(lit(plane), d), lit(100000L)).cast("double") / 100000.0) - 0.5

  /** Sign-bit bucket id from `nPlanes` hyperplanes. */
  def lshBucket(emb: Column, dim: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), lit(dim - 1)),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** ANN top-k: candidates restricted to the query's LSH bucket, then
    * exact cosine rank within the bucket. Returns the same schema as
    * bruteForceTopK (rank is within-bucket).
    */
  def lshTopK(vectors: DataFrame, queries: DataFrame, dim: Int,
              nPlanes: Int = 8, k: Int = 10): DataFrame = {
    val bucketed = vectors.withColumn("bucket",
      lshBucket(col("embedding"), dim, nPlanes))
    val q = queries.withColumn("bucket", lshBucket(col("embedding"), dim, nPlanes))
      .select(col("bucket"), col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = bucketed.select(col("bucket"), col("vec_id").as("cand_id"),
      col("embedding").as("c_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id").asc)
    c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** IVF coarse quantizer: `nCentroids` deterministically hash-sampled
    * corpus vectors (xxhash64 order — seedless and executor-stable).
    * Real systems refine with Lloyd iterations; the partition/probe
    * plumbing is identical.
    */
  def ivfCentroids(vectors: DataFrame, nCentroids: Int): DataFrame =
    vectors.orderBy(xxhash64(col("vec_id")))
      .limit(nCentroids)
      .select(monotonically_increasing_id().as("cid"),
        col("embedding").as("c_emb"))

  /** Assign every vector to its nearest centroid (broadcast nested
    * loop over the tiny centroid set — corpus never shuffles).
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid").asc)
    vectors.crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("embedding"), col("c_emb")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
  }

  /** IVF top-k: probe the query's `nProbe` nearest inverted lists, then
    * exact-rank within them. One equi-join shuffle on the list id
    * instead of |Q|×|C| comparisons; recall comes from nProbe.
    */
  def ivfTopK(vectors: DataFrame, queries: DataFrame,
              nCentroids: Int = 16, nProbe: Int = 4, k: Int = 10): DataFrame = {
    val centroids = ivfCentroids(vectors, nCentroids).cache()
    val assigned = ivfAssign(vectors, centroids)
      .select(col("cid"), col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cid").asc)
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("q_emb"), col("c_emb")))
      .withColumn("crank", row_number().over(probeW))
      .filter(col("crank") <= nProbe)
      .select(col("cid"), col("query_id"), col("q_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id").asc)
    assigned.join(probes, Seq("cid"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold — the
    * semantic-dedup primitive. Broadcast one side when it fits;
    * callers at scale pre-bucket with lshBucket and join on it.
    */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = vectors.select(col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("e_a"), col("e_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
