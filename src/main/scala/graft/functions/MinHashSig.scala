package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The k-slot MinHash signature of a hashed-shingle array in ONE
  * codegen'd pass — bit-parity with the aggregate construction
  * `array((0 until k).map(i => min(xxhash64(lit(i), col("sh")))))`
  * over the exploded index (and with the streaming per-row HOF form
  * `array_min(transform(sh, h => xxhash64(lit(i), h)))`).
  *
  * Spark's `xxhash64(lit(i), sh)` folds children into the running
  * hash: `hashLong(sh, hashInt(i, 42))`. The inner `hashInt(i, 42)` is
  * a per-slot CONSTANT the expression form recomputes for every row —
  * precomputing the k slot seeds halves the hash work, and the tight
  * primitive loop replaces k separate aggregate buffers (the k=400
  * rung carries 400 min-aggregate expressions through codegen) or k
  * interpreted HOF lambdas. A min over the shingle MULTISET equals the
  * min over the set, so positional (non-distinct) window hashes are a
  * valid input.
  *
  * Per-row semantics: null elements are skipped (xxhash64 of a null
  * child contributes nothing to a min that another element wins; the
  * index never produces nulls). An EMPTY array yields k slots of
  * Long.MaxValue — callers must filter empty shingle sets first, which
  * mirrors the aggregate form where a doc with no index rows produces
  * no signature row at all (pinned by MinHashSigSpec).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"signature slots k >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(shs: Any): Any =
    MinHashSig.compute(shs.asInstanceOf[ArrayData], MinHashSig.seeds(k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", MinHashSig.seeds(k),
      "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig$$.MODULE$$.compute($c, $seedsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  /** Per-slot seeds: `hashInt(i, 42)` — exactly the state Spark's
    * `xxhash64(lit(i), sh)` carries into the `sh` hash (lit(i) is an
    * IntegerType literal, hashed by XXH64.hashInt over the default
    * seed 42). Memoized per k — the ladder only ever uses a handful of
    * distinct k values.
    */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  def seeds(k: Int): Array[Long] =
    seedCache.computeIfAbsent(k, kk => Array.tabulate(kk)(i => XXH64.hashInt(i, 42L)))

  def compute(shs: ArrayData, seeds: Array[Long]): ArrayData = {
    val k = seeds.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = shs.numElements()
    var j = 0
    while (j < n) {
      if (!shs.isNullAt(j)) {
        val sh = shs.getLong(j)
        var i = 0
        while (i < k) {
          val h = XXH64.hashLong(sh, seeds(i))
          if (h < out(i)) out(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
