package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** S11 at 100 TB: Bloom-pre-filtered skip-existing anti-join.
  *
  * The reference's incremental-restart contract (skip files already
  * downloaded, `code/download_pdfs_robust.py:100-110`) is a LEFT ANTI
  * join against the manifest of completed outputs. A plain anti-join
  * shuffles the ENTIRE queue on the key — at 100 TB that is a
  * corpus-sized shuffle to discard, typically, a small completed
  * fraction. This operator splits the queue with a Bloom filter built
  * over the manifest keys (the same trick Spark's own runtime
  * row-level filtering injects for large joins, composed here
  * explicitly because an anti-join's probe side cannot be pre-filtered
  * lossily — a row failing the Bloom test must be KEPT, not dropped):
  *
  *  - rows whose key the Bloom filter says it has NEVER seen are
  *    definitely new → emitted directly, zero shuffle;
  *  - the rest ("suspects": true hits + false positives) go through
  *    the exact anti-join, which removes the false positives.
  *
  * The union of the two branches is therefore EXACTLY the plain
  * anti-join — Bloom filters have no false negatives — while the
  * shuffle carries only |manifest ∩ queue| + fpp·|queue| rows instead
  * of |queue|. Cost: one extra pass over the queue scan (two disjoint
  * filters of the same columnar scan) and one small aggregate over the
  * manifest; at scale both are cheap next to the avoided shuffle.
  *
  * Implementation: Spark's internal `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions (codegen-friendly, the exact
  * machinery behind `spark.sql.optimizer.runtimeFilter.bloomFilter`)
  * over `xxhash64(key)` on BOTH sides, so build and probe hash
  * identically. Hash collisions between distinct keys only create
  * extra suspects — the exact join keeps the result lossless. Null
  * queue keys never match any manifest key under SQL join semantics;
  * here `xxhash64` maps null to its seed, so a null-keyed row lands in
  * whichever branch that bit implies and survives either way (the
  * anti-join never equates null with anything).
  *
  * The filter is sized for `fpp` at the measured manifest count and
  * capped at `maxNumBits` (default 2^27 ≈ 16 MiB serialized — ships
  * once per stage in the broadcast task binary). Hitting the cap only
  * degrades the false-positive rate: more suspects, same exact result.
  */
object BloomSkip {

  /** Per-session build locks for the conf set/build/restore window —
    * a PRIVATE monitor, not the SparkSession object itself: the
    * session is a publicly reachable monitor, so locking it would
    * contend with (and block across a Spark action against) any other
    * code that also synchronizes on it. Weak keys, so the map never
    * pins a stopped session in memory.
    */
  private val buildLocks: java.util.Map[org.apache.spark.sql.SparkSession, Object] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, Object]())

  /** Serialized Bloom filter over `xxhash64(keyCol)` of `df`.
    * One count pass sizes it; one aggregate pass builds it
    * (partition-local inserts, bitset-OR merge — order-independent,
    * so the bytes are deterministic for a given input set).
    *
    * `BloomFilterAggregate` silently clamps its arguments to the
    * session runtime-filter caps (`spark.sql.optimizer.runtime
    * .bloomFilter.maxNumBits`, default 2^26 = 8 MiB, and
    * `...maxNumItems`, default 4M) — left alone, a manifest past 4M
    * keys would be sized as if it had 4M and fpp would degrade
    * silently. This builder raises both caps to cover the requested
    * sizing for the duration of the build and restores them after, so
    * the stated fpp holds up to `maxNumBits` (exactness never depends
    * on it either way — a denser filter only adds suspects).
    */
  def bloomBytesOf(df: DataFrame, keyCol: String, fpp: Double,
                   maxNumBits: Long = 1L << 27,
                   knownCount: Long = -1L): Array[Byte] = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // Returns null over an EMPTY input: BloomFilterAggregate evals a
    // zero-cardinality buffer to null (callers must treat a null bloom
    // as "contains nothing", not probe it).
    // knownCount >= 0 skips the sizing scan — callers that already
    // counted the manifest (DownloadSink's gate) pass it through.
    val n = math.max(if (knownCount >= 0) knownCount
                     else df.select(keyCol).count(), 1L)
    // Standard optimal sizing: bits = -n ln(p) / (ln 2)^2.
    val optimal = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val numBits = math.max(64L, math.min(optimal, maxNumBits))
    val agg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col(keyCol))),
        Literal(n), Literal(numBits)).toAggregateExpression())
    // The set/build/restore window mutates SESSION-wide confs, so two
    // concurrent builds on one session could interleave: one build's
    // restore clamping the other's sizing (silent fpp degradation —
    // never exactness). Serialize the window per session; the lock is
    // held only for the build aggregate, and distinct sessions never
    // contend.
    val session = df.sparkSession
    val lock = buildLocks.computeIfAbsent(session, _ => new Object)
    lock.synchronized {
      val conf = session.conf
      val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
      val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
      val bits0 = conf.get(bitsKey)
      val items0 = conf.get(itemsKey)
      try {
        conf.set(bitsKey, math.max(bits0.toLong, numBits).toString)
        conf.set(itemsKey, math.max(items0.toLong, n).toString)
        df.agg(agg.as("bf")).head.getAs[Array[Byte]]("bf")
      } finally {
        conf.set(bitsKey, bits0)
        conf.set(itemsKey, items0)
      }
    }
  }

  /** `might_contain(bloom, xxhash64(key))` as a Column predicate. */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** Exact skip-existing: semantically identical to
    * `queue.join(existing.select(keyCol), Seq(keyCol), "left_anti")`,
    * with only Bloom suspects paying the shuffle.
    *
    * Precondition — DETERMINISTIC inputs: the split evaluates `queue`
    * twice (two disjoint filters of the same plan, unioned) and
    * `existing` three times (count, Bloom build, residual anti-join).
    * Both must re-evaluate to the same rows — true for any parquet /
    * table-backed frame (the production manifest shape), false for
    * plans carrying `rand()`/`uuid()`-derived keys or a source
    * mutating between jobs, where rows could land in neither or both
    * branches. For such inputs, persist/checkpoint first or use the
    * plain single-evaluation anti-join.
    */
  def skipExisting(queue: DataFrame, existing: DataFrame, keyCol: String,
                   fpp: Double = 0.01, maxNumBits: Long = 1L << 27,
                   knownExistingCount: Long = -1L): DataFrame = {
    val bytes = bloomBytesOf(existing, keyCol, fpp, maxNumBits, knownExistingCount)
    // Empty manifest → null bloom → the anti-join is an identity;
    // return the queue as-is rather than probing a null filter (whose
    // null verdicts would drop every row from BOTH branches).
    if (bytes == null) return queue
    val suspect = mightContain(bytes, col(keyCol))
    val definitelyNew = queue.where(!suspect)
    val verified = queue.where(suspect)
      .join(existing.select(col(keyCol)), Seq(keyCol), "left_anti")
    // Restore the caller's column order on the joined branch (a
    // usingColumns join moves the key first) and union positionally
    // by name.
    definitelyNew.unionByName(verified.select(queue.columns.map(col).toSeq: _*))
  }
}
