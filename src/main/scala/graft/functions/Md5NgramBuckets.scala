package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DSIR hashed-ngram bucket ids of a token array in ONE codegen'd pass
  * — bit-parity with the HOF chain in
  * [[graft.text.TextAnalysis.hashedNgramBuckets]]:
  * `transform(concat(tokens, bigrams), f => conv(substring(md5(f), 1, 3), 16, 10))`
  * where bigrams are `concat_ws(" ", slice(tokens, i+1, 2))` (empty
  * below 2 tokens).
  *
  * The bucket id is the first 3 hex digits of md5 — 12 bits, read here
  * straight off the digest bytes (`(b0 << 4) | (b1 >>> 4)`) instead of
  * rendering a 32-char hex string, substringing and base-16 parsing it
  * per feature through three interpreted expressions. Null tokens are
  * skipped by concat_ws in the bigram (no separator) and md5 of a null
  * unigram cannot occur (split never yields nulls) — handled
  * defensively as md5 of the empty string is NOT what the HOF yields
  * for null (it yields null → conv null → null element), so nulls map
  * to null elements for exact parity.
  */
case class Md5NgramBuckets(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def prettyName: String = "md5_ngram_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_ngram_buckets requires array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(toks: Any): Any =
    Md5NgramBuckets.compute(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5NgramBuckets$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5NgramBuckets {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def bucketOf(bytes: Array[Byte]): Int = {
    val md = digest.get()
    md.reset()
    val h = md.digest(bytes)
    ((h(0) & 0xFF) << 4) | ((h(1) & 0xF0) >>> 4)
  }

  def compute(toks: ArrayData): ArrayData = {
    val m = toks.numElements()
    val ts = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      ts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val nBi = if (m < 2) 0 else m - 1
    val out = new Array[Any](m + nBi)
    i = 0
    while (i < m) {
      // null unigram → md5(null) → null bucket (HOF parity)
      out(i) = if (ts(i) == null) null else Int.box(bucketOf(ts(i).getBytes))
      i += 1
    }
    i = 0
    while (i < nBi) {
      val a = ts(i)
      val b = ts(i + 1)
      // concat_ws(" ", a, b) skips nulls: both null → "", one null →
      // the other alone, else "a b" — never a null bigram
      val s =
        if (a == null && b == null) UTF8String.EMPTY_UTF8
        else if (a == null) b
        else if (b == null) a
        else UTF8String.concat(a, UTF8String.fromString(" "), b)
      out(m + i) = Int.box(bucketOf(s.getBytes))
      i += 1
    }
    new GenericArrayData(out)
  }
}
