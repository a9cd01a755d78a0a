package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The text-gate scoring pair as codegen'd expressions — bit-parity
  * with the Column chains in [[graft.text.TextAnalysis]]:
  *
  *  - [[LangIdScore]]: first language (inventory order) whose distinct
  *    stopword-hit count is >= every other language's and > 0, else
  *    "und" — exactly the foldRight CASE chain over
  *    `size(array_intersect(tokens, words))` scores. One token-set
  *    build + |inventory| lookups replaces 5 per-row array_intersect
  *    hash builds.
  *  - [[QualityScoreExpr]]: `round(0.3·lengthScore + 0.2·wordLenScore
  *    + 0.3·alphaScore + 0.2·stopScore, 6)` with every signal computed
  *    exactly as the Column form: nTok = size(tokens), nChars =
  *    length(text) (codepoints), alphaChars = kept-char count of
  *    `regexp_replace(text, "[^A-Za-z]", "")` (ASCII letters are
  *    single-byte in UTF-8, so a byte scan is exact), stopScore over
  *    the FIRST inventory language, same IEEE association order, same
  *    Spark round-on-double. Null text or null token array → null —
  *    the Column form's null propagation.
  *
  * Both take the stopword inventory as a constructor literal so the
  * expressions stay pure functions of their inputs.
  */
case class LangIdScore(child: Expression, inventory: Seq[(String, Seq[String])])
    extends UnaryExpression {

  locally {
    require(inventory.nonEmpty, "lang_id: need >= 1 language")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_id requires array<string>, got ${t.simpleString}")
  }

  @transient private lazy val langs: Array[UTF8String] =
    inventory.map(l => UTF8String.fromString(l._1)).toArray
  @transient private lazy val words: Array[Array[UTF8String]] =
    inventory.map(_._2.map(UTF8String.fromString).toArray).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    LangIdScore.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], langs, words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val langsRef = ctx.addReferenceObj("lidLangs", langs,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val wordsRef = ctx.addReferenceObj("lidWords", words,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.unsafe.types.UTF8String ${ev.value} =
          graft.functions.LangIdScore$$.MODULE$$.compute(
            ${childGen.isNull} ? null :
              (org.apache.spark.sql.catalyst.util.ArrayData) ${childGen.value},
            $langsRef, $wordsRef);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdScore {

  private val Und = UTF8String.fromString("und")

  private[functions] def tokenSet(toks: ArrayData): java.util.HashSet[UTF8String] = {
    val n = toks.numElements()
    val set = new java.util.HashSet[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) set.add(toks.getUTF8String(i))
      i += 1
    }
    set
  }

  private[functions] def hits(set: java.util.HashSet[UTF8String],
                              ws: Array[UTF8String]): Int = {
    var c = 0
    var i = 0
    while (i < ws.length) {
      if (set.contains(ws(i))) c += 1
      i += 1
    }
    c
  }

  def compute(toks: ArrayData, langs: Array[UTF8String],
              words: Array[Array[UTF8String]]): UTF8String = {
    // null token array → every score null → the CASE chain falls
    // through to "und"
    if (toks == null) return Und
    val set = tokenSet(toks)
    val scores = new Array[Int](langs.length)
    var i = 0
    var best = 0
    while (i < langs.length) {
      scores(i) = hits(set, words(i))
      if (scores(i) > best) best = scores(i)
      i += 1
    }
    if (best == 0) return Und
    i = 0
    while (i < langs.length) {
      if (scores(i) == best) return langs(i)
      i += 1
    }
    Und
  }
}

case class QualityScoreExpr(left: Expression, right: Expression,
                            stopwords: Seq[String])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "quality_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"quality_score requires (string, array<string>), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  @transient private lazy val ws: Array[UTF8String] =
    stopwords.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(text: Any, toks: Any): Any =
    QualityScoreExpr.compute(text.asInstanceOf[UTF8String],
      toks.asInstanceOf[ArrayData], ws)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wsRef = ctx.addReferenceObj("qsWords", ws,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev,
      (t, a) => s"graft.functions.QualityScoreExpr$$.MODULE$$.compute($t, $a, $wsRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QualityScoreExpr {

  private def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(text: UTF8String, toks: ArrayData, ws: Array[UTF8String]): Double = {
    val nTok = toks.numElements().toDouble
    val nChars = text.numChars().toDouble
    // alphaChars: [A-Za-z] occurrences — ASCII letters are single-byte
    // in UTF-8 and multi-byte sequences never contain bytes < 0x80, so
    // the byte scan equals the regexp_replace + length chain exactly
    val bytes = text.getBytes
    var alpha = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha += 1
      i += 1
    }
    val alphaChars = alpha.toDouble
    val meanWordLen = nChars / math.max(nTok, 1.0)
    val lengthScore = math.min(nTok / 100.0, 1.0)
    val wordLenScore = if (meanWordLen >= 3.0 && meanWordLen <= 10.0) 1.0 else 0.3
    val alphaScore = alphaChars / math.max(nChars, 1.0)
    val stopHits = LangIdScore.hits(LangIdScore.tokenSet(toks), ws).toDouble
    val stopScore = math.min(stopHits / 3.0, 1.0)
    round6(lengthScore * 0.3 + wordLenScore * 0.2 + alphaScore * 0.3 +
      stopScore * 0.2)
  }
}
