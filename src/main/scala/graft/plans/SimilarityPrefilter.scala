package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RatcliffObershelp

/** `ro_similarity(a, b)` bounded above by 2·min(|a|,|b|)/(|a|+|b|)
  * (M ≤ min length). When the predicate is `ratio > t`, a pair whose
  * length bound is ≤ t can short-circuit to 0.0 without running the
  * O(|a|·|b|) match search — the dominant cost inside similarity-join
  * candidate filters.
  */
case class BoundedRatio(a: Expression, b: Expression, threshold: Double)
    extends BinaryExpression {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ro_similarity_bounded"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    BoundedRatio.eval(
      x.asInstanceOf[UTF8String].toString,
      y.asInstanceOf[UTF8String].toString, threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.plans.BoundedRatio$$.MODULE$$.eval($x.toString(), $y.toString(), $threshold)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(a = newLeft, b = newRight)
}

object BoundedRatio {
  def eval(a: String, b: String, t: Double): Double = {
    val total = a.length + b.length
    if (total == 0) return 1.0
    val bound = 2.0 * math.min(a.length, b.length) / total
    if (bound <= t) 0.0 else RatcliffObershelp.ratio(a, b)
  }
}

/** Optimizer rule: `ro_similarity(a,b) > lit(t)` →
  * `ro_similarity_bounded(a,b,t) > lit(t)`. A pure equivalence (the
  * bailout value 0.0 and the true ratio fall on the same side of t
  * whenever the bound ≤ t), so it is sound in any expression context —
  * including under NOT or inside the dedup predicate's OR.
  */
object SimilarityPrefilterRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(ro: RatcliffObershelp, l @ Literal(t: Double, DoubleType))
          if t > 0.0 =>
        GreaterThan(BoundedRatio(ro.a, ro.b, t), l)
      case LessThan(l @ Literal(t: Double, DoubleType), ro: RatcliffObershelp)
          if t > 0.0 =>
        LessThan(l, BoundedRatio(ro.a, ro.b, t))
    }
}

/** Production wiring: `.withExtensions(new GraftExtensions)` (or
  * spark.sql.extensions=graft.plans.GraftExtensions) injects the
  * similarity prefilter and registers graft's SQL functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SimilarityPrefilterRule)
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("uuid5"),
        new ExpressionInfo("graft.functions.Uuid5", "uuid5"),
        (exprs: Seq[Expression]) => graft.functions.Uuid5(exprs.head, exprs(1))))
    e.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("ro_similarity"),
        new ExpressionInfo("graft.functions.RatcliffObershelp", "ro_similarity"),
        (exprs: Seq[Expression]) => RatcliffObershelp(exprs.head, exprs(1))))
    e.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
        new ExpressionInfo("graft.functions.DotProduct", "dot_product"),
        (exprs: Seq[Expression]) =>
          graft.functions.DotProduct(exprs.head, exprs(1))))
    e.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("sample_k"),
        new ExpressionInfo("graft.functions.HashSampleK", "sample_k"),
        (exprs: Seq[Expression]) => {
          val k = exprs(1) match {
            case Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"sample_k(col, k) needs a literal int k, got $other")
          }
          graft.functions.HashSampleK(exprs.head, k)
        }))
  }
}
