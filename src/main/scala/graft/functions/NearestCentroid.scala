package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Nearest-centroid assignment as ONE codegen'd pass: the POSITION
  * (0-based, in the given centroid order) of the centroid maximizing
  * `round(dot(e, c_j) / (norm(e) * norm(c_j)), 6)` — bit-parity with
  * the former crossJoin(broadcast(centroids)) + cosinePre + rank-1
  * window, which shuffled n×nCentroids rows CARRYING THE EMBEDDING
  * ARRAYS through an exchange just to pick each row's argmax.
  *
  * Parity details (each mirrors the window form exactly):
  *  - norm(e) = sqrt(dot(e,e)) accumulated as doubles in index order;
  *  - the 6-dp round is Spark's Round-on-double (BigDecimal.valueOf →
  *    setScale HALF_UP; NaN/Inf pass through unrounded);
  *  - comparison is java.lang.Double.compare — NaN ranks above every
  *    number, exactly Spark's descending-sort placement — and ties
  *    keep the EARLIEST position (the `cid asc` tie rule, given the
  *    caller passes centroids in ascending-cid order);
  *  - a null embedding or null element made every csim null, and the
  *    rank-1 window then fell back to the pure cid-asc order → the
  *    smallest cid: position 0 here.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  locally {
    require(centroids.nonEmpty, "nearest_centroid: need >= 1 centroid")
    require(centroids.map(_.length).distinct.sizeIs == 1,
      "nearest_centroid: centroid widths must be uniform")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float|double>, got ${t.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val mat: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val cNorms: Array[Double] =
    mat.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    NearestCentroid.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], mat, cNorms, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val matRef = ctx.addReferenceObj("ncMat", mat, "double[][]")
    val normRef = ctx.addReferenceObj("ncNorms", cNorms, "double[]")
    ev.copy(
      code = code"""
        ${childGen.code}
        int ${ev.value} = graft.functions.NearestCentroid$$.MODULE$$.compute(
          ${childGen.isNull} ? null :
            (org.apache.spark.sql.catalyst.util.ArrayData) ${childGen.value},
          $matRef, $normRef, $isFloat);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {

  /** Spark Round-on-double parity: NaN/Inf unrounded, else
    * BigDecimal.valueOf(d).setScale(6, HALF_UP).
    */
  private def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(a: ArrayData, mat: Array[Array[Double]], cNorms: Array[Double],
              aFloat: Boolean): Int = {
    if (a == null) return 0
    val dim = mat(0).length
    if (a.numElements() < dim) return 0
    var i = 0
    var acc = 0.0
    while (i < dim) {
      if (a.isNullAt(i)) return 0 // null element → all csim null → cid-asc
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    val eNorm = math.sqrt(acc)
    var bestJ = 0
    var bestSim = Double.NaN
    var j = 0
    while (j < mat.length) {
      val c = mat(j)
      var dot = 0.0
      i = 0
      while (i < dim) {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        dot += x * c(i)
        i += 1
      }
      val sim = round6(dot / (eNorm * cNorms(j)))
      if (j == 0 || java.lang.Double.compare(sim, bestSim) > 0) {
        bestSim = sim; bestJ = j
      }
      j += 1
    }
    bestJ
  }
}
