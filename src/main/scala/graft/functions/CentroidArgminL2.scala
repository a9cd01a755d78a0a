package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** k-means assignment argmin as ONE codegen'd pass: the position and
  * winning distance of the centroid minimizing
  * `round(dot(e,e) − 2·dot(e,c_j) + dot(c_j,c_j), 6)` — bit-parity
  * with [[graft.similarity.Clustering]]'s former
  * crossJoin(broadcast(centroids)) + rank-1 window, which shuffled
  * n×k rows carrying the embeddings to keep each row's argmin.
  *
  * Parity details: double accumulation in index order for every dot;
  * the d2 combine order is `(e² − 2.0·dot) + c²` exactly as the column
  * chain associates; the 6-dp round is Spark's Round-on-double;
  * comparison is java.lang.Double.compare (NaN sorts last under `asc`,
  * so a NaN d2 never wins over a number) with ties keeping the
  * EARLIEST position (the cid-asc tie rule, centroids passed in
  * ascending-cid order); a null embedding or null element made every
  * d2 null and the rank-1 window fell back to cid order → position 0
  * with a null d2.
  */
case class CentroidArgminL2(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  locally {
    require(centroids.nonEmpty, "centroid_argmin_l2: need >= 1 centroid")
    require(centroids.map(_.length).distinct.sizeIs == 1,
      "centroid_argmin_l2: centroid widths must be uniform")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("d2", DoubleType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "centroid_argmin_l2"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"centroid_argmin_l2 requires array<float|double>, got ${t.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val mat: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val cN2: Array[Double] =
    mat.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    CentroidArgminL2.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], mat, cN2, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val matRef = ctx.addReferenceObj("camMat", mat, "double[][]")
    val normRef = ctx.addReferenceObj("camN2", cN2, "double[]")
    ev.copy(
      code = code"""
        ${childGen.code}
        InternalRow ${ev.value} = graft.functions.CentroidArgminL2$$.MODULE$$.compute(
          ${childGen.isNull} ? null :
            (org.apache.spark.sql.catalyst.util.ArrayData) ${childGen.value},
          $matRef, $normRef, $isFloat);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidArgminL2 {

  private def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(a: ArrayData, mat: Array[Array[Double]], cN2: Array[Double],
              aFloat: Boolean): InternalRow = {
    def nullWin: InternalRow = {
      val r = new GenericInternalRow(2)
      r.setInt(0, 0)
      r.setNullAt(1)
      r
    }
    if (a == null) return nullWin
    val dim = mat(0).length
    if (a.numElements() < dim) return nullWin
    var i = 0
    var eN2 = 0.0
    while (i < dim) {
      if (a.isNullAt(i)) return nullWin
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      eN2 += x * x
      i += 1
    }
    var bestJ = 0
    var bestD2 = 0.0
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
      val d2 = round6((eN2 - 2.0 * dot) + cN2(j))
      if (j == 0 || java.lang.Double.compare(d2, bestD2) < 0) {
        bestD2 = d2; bestJ = j
      }
      j += 1
    }
    val r = new GenericInternalRow(2)
    r.setInt(0, bestJ)
    r.setDouble(1, bestD2)
    r
  }
}
