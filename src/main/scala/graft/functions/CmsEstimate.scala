package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch, item)` — point-query a serialized
  * Count-Min sketch (the binary produced by Spark's
  * `count_min_sketch` aggregate) for a string item's estimated count.
  *
  * Spark ships the mergeable-sketch AGGREGATE but no expression to
  * read the result inside a plan; without this, querying the sketch
  * means collecting the blob to the driver. With it, the sketch stays
  * a broadcast-joined column and the probe side stays distributed —
  * the shape heavy-hitter verification needs at 100 TB (one fixed-size
  * sketch pass over the corpus + a tiny probe set, instead of a
  * second full groupBy).
  *
  * Hashing parity: the aggregate adds string values as their UTF-8
  * bytes (`addBinary`), so the probe calls `estimateCount` with the
  * UTF8String's bytes — same Murmur3 path, bit-identical counts. The
  * deserialized sketch is cached per expression instance keyed on the
  * serialized bytes (content compare — a KB-scale memcmp, paid only
  * when the blob reference changes), so per-row cost after the first
  * probe is the d×w table lookups.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires (binary, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  /** Deserialize-once probe; also the codegen entry point. */
  def estimate(sketchBytes: Array[Byte], item: UTF8String): Long = {
    if ((sketchBytes ne cachedBytes) &&
        !java.util.Arrays.equals(sketchBytes, cachedBytes)) {
      cachedSketch = CountMinSketch.readFrom(sketchBytes)
      cachedBytes = sketchBytes
    }
    cachedSketch.estimateCount(item.getBytes)
  }

  override protected def nullSafeEval(sk: Any, item: Any): Any =
    estimate(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimate", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, (sk, it) => s"${ev.value} = $ref.estimate($sk, $it);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
