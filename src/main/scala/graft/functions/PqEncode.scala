package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization encoder as ONE native expression: for each of
  * the m subspaces, the code is argmin_j |c_j|² − 2⟨sub, c_j⟩ against
  * the trained codebooks — all m codes computed in a single static
  * call over primitive arrays.
  *
  * Why not compose it from column functions: the literal form
  * (m × k `DotProduct`s under array_min/array_position) builds a
  * ~1000-node projection whose generated code blows past janino's
  * method limits, so Catalyst silently falls back to interpreted
  * evaluation — measured ~30 s over a 20k-row corpus at m=16, k=32
  * where this expression encodes the same rows in under a second.
  *
  * Arithmetic matches the literal form bit-for-bit: per-subspace dot
  * accumulated in index order, dist = cnorm − 2.0·dot, first minimum
  * wins (strict <, the array_position-of-array_min tie rule).
  *
  * Codebooks are held as Seq (structural equality keeps expression
  * canonicalization sane) and flattened to primitive arrays once per
  * executor via a transient lazy val.
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  // Fail at construction with a descriptive message, not at eval time
  // with an opaque ArrayIndexOutOfBounds: compute() derives subDim from
  // codebooks(0)(0) and assumes every subspace is non-empty and
  // uniform-width (an empty subspace would otherwise silently emit
  // code 0; degenerate training input would NPE mid-query).
  locally {
    require(codebooks.nonEmpty, "pq_encode: codebooks must have >= 1 subspace")
    require(codebooks.forall(_.nonEmpty),
      "pq_encode: every subspace codebook needs >= 1 centroid " +
        "(degenerate/empty training input?)")
    val widths = codebooks.flatMap(_.map(_.length)).distinct
    require(widths.sizeIs == 1 && widths.head > 0,
      s"pq_encode: centroid widths must be uniform and positive, got $widths")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires an array<float|double> operand, got ${t.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val flatCbs: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val cNorm2: Array[Array[Double]] =
    flatCbs.map(_.map(c => { var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }; s }))

  override protected def nullSafeEval(a: Any): Any =
    PqEncode.compute(a.asInstanceOf[ArrayData], flatCbs, cNorm2, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbsRef = ctx.addReferenceObj("pqCbs", flatCbs, "double[][][]")
    val normRef = ctx.addReferenceObj("pqNorms", cNorm2, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("pqCodes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $boxed =
         |  graft.functions.PqEncode$$.MODULE$$.compute($a, $cbsRef, $normRef, $isFloat);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  /** Null (poison) when the vector is shorter than m·subDim or carries
    * a null element — mirrors the DotProduct null semantics the
    * literal form had.
    */
  def compute(a: ArrayData, cbs: Array[Array[Array[Double]]],
              norms: Array[Array[Double]], aFloat: Boolean): ArrayData = {
    val m = cbs.length
    if (m == 0) return new GenericArrayData(Array.emptyIntArray)
    val subDim = cbs(0)(0).length
    if (a.numElements() < m * subDim) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = cbs(s)
      val base = s * subDim
      var best = Double.MaxValue
      var bestJ = 0
      var j = 0
      while (j < cb.length) {
        val cj = cb(j)
        var dot = 0.0
        var t = 0
        while (t < subDim) {
          if (a.isNullAt(base + t)) return null
          val x = if (aFloat) a.getFloat(base + t).toDouble else a.getDouble(base + t)
          dot += x * cj(t)
          t += 1
        }
        val dist = norms(s)(j) - 2.0 * dot
        if (dist < best) { best = dist; bestJ = j }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new GenericArrayData(codes)
  }
}
