package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Determinism and geometry of the oracle-replayable k-means family. */
class ClusteringSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Two well-separated blobs around (±10, 0, 0, 0): k-means with k=2
    * must put each blob in one cluster regardless of seeds.
    */
  private def blobs = (0 until 20).map { i =>
    val sign = if (i % 2 == 0) 1.0f else -1.0f
    val jitter = (i % 5) * 0.01f
    (i.toLong, Array(sign * 10.0f + jitter, jitter, -jitter, 0.1f * sign))
  }.toDF("vec_id", "embedding")

  test("kmeans separates well-separated blobs") {
    val assigned = Clustering.kmeansAssign(blobs, k = 2, iters = 2)
    val byCluster = assigned
      .withColumn("side", when(col("vec_id") % 2 === 0, "pos").otherwise("neg"))
      .groupBy(col("cluster"))
      .agg(countDistinct(col("side")).as("sides"))
      .select(max(col("sides"))).as[Long].head()
    assert(byCluster === 1L, "a cluster mixed the two blobs")
  }

  test("assignment is identical across partitioning layouts") {
    val a = Clustering.kmeansAssign(blobs.repartition(1), k = 2, iters = 2)
      .orderBy("vec_id").collect().toSeq
    val b = Clustering.kmeansAssign(blobs.repartition(7), k = 2, iters = 2)
      .orderBy("vec_id").collect().toSeq
    assert(a === b, "partitioning changed the assignment — decimal means broken")
  }

  test("trainCap trains on a subset but assigns every vector") {
    val assigned = Clustering.kmeansAssign(blobs, k = 2, iters = 2, trainCap = 8)
    assert(assigned.count() === 20L)
    assert(assigned.select(countDistinct(col("cluster"))).as[Long].head() === 2L)
  }

  test("distanceOutliers flags the planted far point and only it") {
    val planted = blobs.unionByName(
      Seq((99L, Array(30.0f, 25.0f, -20.0f, 8.0f))).toDF("vec_id", "embedding"))
    // flagging is two-sided; the planted point must be the only
    // FAR-side flag (z > 0) — near-side flags are duplicate detection
    val flagged = Clustering.distanceOutliers(
        Clustering.kmeansAssign(planted, k = 2, iters = 2))
      .filter(col("is_outlier") && col("z") > 0)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(flagged === Set(99L), s"expected only the planted far outlier, got $flagged")
  }

  test("every vector lands on its true nearest centroid (plain-Scala replay)") {
    val cents = Clustering.kmeansCentroids(blobs, k = 2, iters = 2)
    val got = Clustering.kmeansAssign(blobs, k = 2, iters = 2)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val data = blobs.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    def round6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (((id, e), (gid, gc, gd)) <- data.zip(got)) {
      assert(id === gid)
      // same operation order as the engine: three index-order dots
      val want = cents.map { case (cid, c) =>
        val dee = e.foldLeft(0.0)((a, x) => a + x * x)
        val dec = e.zip(c).foldLeft(0.0)((a, p) => a + p._1 * p._2)
        val dcc = c.foldLeft(0.0)((a, x) => a + x * x)
        (round6(dee - 2.0 * dec + dcc), cid)
      }.min
      assert((want._2, want._1) === ((gc, gd)),
        s"vec $id: expected cluster ${want._2} d2 ${want._1}, got $gc $gd")
    }
  }

  test("the streaming route plan is joinless and stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cents = Clustering.kmeansCentroids(blobs, k = 2, iters = 2)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .withColumn("r", Clustering.routeToCentroids(cents, col("embedding")))
      .select(col("vec_id"), col("r").getField("cid").as("cluster"))
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_route_planspec").start()
    try {
      mem.addData((1L, Array(10f, 0f, 0f, 0.1f)))
      q.processAllAvailable()
      val plan = q.asInstanceOf[org.apache.spark.sql.execution.streaming
          .runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(!plan.contains("Join") && !plan.contains("StateStore"),
        s"route plan gained a join or state store:\n$plan")
    } finally q.stop()
  }

  test("routeToCentroids matches the batch assignment bit-for-bit") {
    val batch = Clustering.kmeansAssign(blobs, k = 2, iters = 2)
      .orderBy("vec_id").collect().toSeq
    val cents = Clustering.kmeansCentroids(blobs, k = 2, iters = 2)
    val routed = blobs
      .withColumn("r", Clustering.routeToCentroids(cents, col("embedding")))
      .select(col("vec_id"), col("r").getField("cid").as("cluster"),
        col("r").getField("d2").as("dist2"))
      .orderBy("vec_id").collect().toSeq
    assert(routed === batch, "literal-argmin route drifted from batch assignment")
  }

  /** 30 deterministic pseudo-random 32-dim vectors (splitmix-style
    * integer mix — wide cosine spread, so no accidental ≥0.99 pair)
    * plus near-identical copies of ids 0, 7 and 13 planted at +100.
    */
  private def semCorpus = {
    def vec(i: Int): Array[Float] = Array.tabulate(32) { d =>
      var z = (i * 37L + d) * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      ((z ^ (z >>> 27)).toDouble / Long.MaxValue).toFloat
    }
    val base = (0 until 30).map(i => (i.toLong, vec(i)))
    val copies = Seq(0, 7, 13).map(i =>
      (i + 100L, vec(i).map(x => x * 1.0001f + 0.0001f)))
    (base ++ copies).toDF("vec_id", "embedding")
  }

  test("semDedup keeps one representative per planted duplicate group") {
    val out = Clustering.semDedup(semCorpus, k = 4, iters = 2, threshold = 0.99)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.size === 33, "one output row per input vector")
    for (i <- Seq(0L, 7L, 13L)) {
      assert(out(i + 100)._2 === i, s"copy ${i + 100} must canonicalize to $i")
      assert(!out(i + 100)._3 && out(i)._3,
        s"original $i kept, copy ${i + 100} dropped")
      assert(out(i + 100)._1 === out(i)._1,
        s"a near-identical copy landed in a different k-means cell")
    }
    for ((id, (_, canon, kept)) <- out if id < 100 ) {
      assert(canon === id && kept, s"non-duplicate $id must keep itself")
    }
  }

  test("semDedup scale path (two-level assignment) equals flat when probes cover the super-cells") {
    // Force the scale gate at fixture size (twoLevelCells = 2 < k = 4):
    // assignment routes through assignTwoLevel. With scaleProbe >= s =
    // ceil(sqrt(4)) = 2 every super-cell is probed, so two-level is
    // EXACTLY the flat argmin and the whole semDedup output must match
    // row-for-row — the equality contract the gated registry queries
    // rely on (they only cross the gate at replica scale, where the
    // bit-replay twins never run).
    val flat = Clustering.semDedup(semCorpus, k = 4, iters = 2,
        threshold = 0.99)
      .collect().map(_.toSeq).toSet
    val twoLevel = Clustering.semDedup(semCorpus, k = 4, iters = 2,
        threshold = 0.99, twoLevelCells = 2, scaleProbe = 2)
      .collect().map(_.toSeq).toSet
    assert(twoLevel === flat)
    // At a narrow probe the result is still deterministic and keeps
    // the dedup property on the planted copies (blocking may move
    // cell boundaries, never pair recall for near-identical vectors).
    val narrow = Clustering.semDedup(semCorpus, k = 4, iters = 2,
        threshold = 0.99, twoLevelCells = 2, scaleProbe = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(narrow.size === 33)
    for (i <- Seq(0L, 7L, 13L)) {
      assert(narrow(i + 100)._1 === i && !narrow(i + 100)._2 && narrow(i)._2)
    }
    val narrow2 = Clustering.semDedup(semCorpus.repartition(7), k = 4,
        iters = 2, threshold = 0.99, twoLevelCells = 2, scaleProbe = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(narrow2 === narrow)
  }

  test("semDedup matches a plain-Scala within-cell replay") {
    val df = semCorpus
    val assigned = Clustering.kmeansAssign(df, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]) = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      round6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    }
    // union-find over the within-cell >= threshold pairs
    val ids = vecs.keys.toSeq.sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- ids; b <- ids if a < b
         if assigned(a) == assigned(b) && cos(vecs(a), vecs(b)) >= 0.99) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = ids.map(i => i -> find(i)).toMap
    val got = Clustering.semDedup(df, k = 4, iters = 2, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === want, "semDedup canonical map drifted from the replay")
  }

  test("stratifiedSample returns perCluster rows per cluster, hash-stable") {
    val assigned = Clustering.kmeansAssign(blobs, k = 2, iters = 2)
    val s1 = Clustering.stratifiedSample(assigned, perCluster = 3)
    assert(s1.groupBy(col("cluster")).count().select(min(col("count")))
      .as[Long].head() === 3L)
    val s2 = Clustering.stratifiedSample(assigned.repartition(5), perCluster = 3)
    assert(s1.orderBy("cluster", "rank").collect().toSeq ===
      s2.orderBy("cluster", "rank").collect().toSeq)
  }
}
