package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Ratcliff–Obershelp similarity (`difflib.SequenceMatcher.ratio`) as a
  * native expression — exact parity with the similarity the reference's
  * fuzzy dedup thresholds at 0.95 (`code/structure_data.py:178,186`).
  *
  * ratio = 2·M / (|a|+|b|), where M is the total matched chars from
  * recursively taking the longest matching block (ties: smallest i,
  * then smallest j — difflib's choice) and recursing on both sides.
  */
case class RatcliffObershelp(a: Expression, b: Expression)
    extends BinaryExpression {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ro_similarity"

  override def checkInputDataTypes(): TypeCheckResult =
    if (a.dataType == StringType && b.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ro_similarity requires (string, string), got (${a.dataType}, ${b.dataType})")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    RatcliffObershelp.ratio(
      x.asInstanceOf[UTF8String].toString, y.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.RatcliffObershelp$$.MODULE$$.ratio($x.toString(), $y.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(a = newLeft, b = newRight)
}

object RatcliffObershelp {

  def ratio(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) return 1.0
    2.0 * matchCount(a, 0, a.length, b, 0, b.length) / total
  }

  /** Longest matching block in a[alo,ahi) × b[blo,bhi), difflib
    * tie-break (maximal size, then smallest i, then smallest j), then
    * recurse left and right of the block.
    */
  private def matchCount(a: String, alo: Int, ahi: Int,
                         b: String, blo: Int, bhi: Int): Int = {
    if (alo >= ahi || blo >= bhi) return 0
    var bestI = alo; var bestJ = blo; var bestSize = 0
    // j2len(j) = length of longest common suffix ending at (i, j)
    var j2len = new Array[Int](bhi - blo)
    var i = alo
    while (i < ahi) {
      val newJ2len = new Array[Int](bhi - blo)
      var j = blo
      while (j < bhi) {
        if (a.charAt(i) == b.charAt(j)) {
          val k = (if (j > blo) j2len(j - 1 - blo) else 0) + 1
          newJ2len(j - blo) = k
          if (k > bestSize) { bestI = i - k + 1; bestJ = j - k + 1; bestSize = k }
        }
        j += 1
      }
      j2len = newJ2len
      i += 1
    }
    if (bestSize == 0) 0
    else bestSize +
      matchCount(a, alo, bestI, b, blo, bestJ) +
      matchCount(a, bestI + bestSize, ahi, b, bestJ + bestSize, bhi)
  }
}
