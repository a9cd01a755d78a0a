package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** L2-normalize a numeric array in ONE codegen'd pass — bit-parity
  * with `transform(e, x => x.cast("double") / norm(e))` where
  * `norm(e) = sqrt(dot(e, e))` accumulates double products in index
  * order. The HOF form re-evaluates the CAPTURED norm subtree once per
  * element (the let1 trap): O(dim²) multiplies per vector; this is the
  * O(dim) form with the identical IEEE result (norm computed once,
  * same accumulation order, same per-element double division).
  *
  * Null semantics match the HOF chain: a null element poisons the dot
  * product → null norm → every output element null; a zero vector
  * divides by 0.0 exactly as the column form does (IEEE ±Inf/NaN).
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "l2_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"l2_normalize requires array<float|double>, got ${t.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any =
    L2Normalize.compute(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.L2Normalize$$.MODULE$$.compute($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object L2Normalize {
  def compute(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    var i = 0
    var hasNull = false
    var acc = 0.0
    while (i < n && !hasNull) {
      if (a.isNullAt(i)) hasNull = true
      else {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        acc += x * x
      }
      i += 1
    }
    val out = new Array[Any](n)
    if (hasNull) return new GenericArrayData(out) // all nulls — HOF parity
    val nrm = math.sqrt(acc)
    i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = java.lang.Double.valueOf(x / nrm)
      i += 1
    }
    new GenericArrayData(out)
  }
}
