package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** All n-gram window hashes of a token array in ONE codegen'd pass —
  * bit-parity with the HOF chain
  * `transform(shingles(c, n), s => xxhash64(s))` where `shingles`
  * builds each window as `concat_ws(" ", slice(tokens, i+1, n))`.
  *
  * Why an expression: the HOF chain is interpreted (higher-order
  * functions are CodegenFallback) and per window allocates a slice
  * array plus a concatenated UTF8String before hashing — at corpus
  * scale that is one lambda dispatch + two allocations per token of
  * every document, the single hottest loop of the dedup family. Here
  * the window bytes are assembled into one reusable scratch buffer and
  * hashed in place (XXH64 over the identical UTF-8 bytes, seed 42 —
  * the Spark `xxhash64` default), so the values are identical and the
  * loop is allocation-free.
  *
  * Parity contract (pinned by ShingleHashesSpec against the Column
  * form): fewer than n tokens → empty array; null tokens are skipped
  * exactly like concat_ws (no separator contributed); output position
  * w hashes tokens [w, w+n).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle width n >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(toks: Any): Any =
    ShingleHashes.compute(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  private val Seed = 42L // Spark's xxhash64 default seed

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val ts = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      ts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    var buf = new Array[Byte](256)
    var w = 0
    while (w <= m - n) {
      // concat_ws(" ", window): non-null tokens joined by one space
      var len = 0
      var first = true
      var j = 0
      while (j < n) {
        val t = ts(w + j)
        if (t != null) {
          len += (if (first) 0 else 1) + t.numBytes()
          first = false
        }
        j += 1
      }
      if (buf.length < len) {
        var cap = buf.length
        while (cap < len) cap *= 2
        buf = new Array[Byte](cap)
      }
      var off = 0
      first = true
      j = 0
      while (j < n) {
        val t = ts(w + j)
        if (t != null) {
          if (!first) { buf(off) = ' '.toByte; off += 1 }
          t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + off)
          off += t.numBytes()
          first = false
        }
        j += 1
      }
      out(w) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed)
      w += 1
    }
    new GenericArrayData(out)
  }
}
