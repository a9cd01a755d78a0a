package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 4122 version-5 (SHA-1, name-based) UUID as a native Catalyst
  * expression — byte-parity with Python's `uuid.uuid5`, which the
  * reference uses for deterministic company ids
  * (`code/structure_data.py:118-122`).
  *
  * Implemented as a real `Expression` with `doGenCode` (a static-call
  * emit, so it stays inside whole-stage codegen) rather than a Scala
  * UDF: no serialization overhead, null-safety handled by the
  * expression framework, and deterministic so Catalyst may constant-fold
  * it over foldable inputs.
  */
case class Uuid5(namespace: Expression, name: Expression)
    extends BinaryExpression {

  override def left: Expression = namespace
  override def right: Expression = name
  override def dataType: DataType = StringType
  override def prettyName: String = "uuid5"

  override def checkInputDataTypes(): TypeCheckResult =
    if (namespace.dataType == StringType && name.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"uuid5 requires (string, string), got (${namespace.dataType}, ${name.dataType})")

  override protected def nullSafeEval(ns: Any, n: Any): Any =
    Uuid5.compute(ns.asInstanceOf[UTF8String], n.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (ns, n) => s"graft.functions.Uuid5$$.MODULE$$.compute($ns, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(namespace = newLeft, name = newRight)
}

object Uuid5 {
  /** The RFC 4122 DNS namespace — the fixed namespace the reference
    * passes to `uuid.uuid5` (`code/structure_data.py:120`).
    */
  val NamespaceDns = "6ba7b810-9dad-11d1-80b4-00c04fd430c8"

  private val HexChars = "0123456789abcdef".toCharArray

  /** SHA-1(namespace bytes ++ name UTF-8 bytes), truncated to 16 bytes,
    * version nibble forced to 5, variant bits to RFC 4122 (10xx).
    */
  def compute(namespace: UTF8String, name: UTF8String): UTF8String = {
    val nsUuid = java.util.UUID.fromString(namespace.toString)
    val nsBytes = new Array[Byte](16)
    var ms = nsUuid.getMostSignificantBits
    var ls = nsUuid.getLeastSignificantBits
    var i = 7
    while (i >= 0) { nsBytes(i) = (ms & 0xFF).toByte; ms >>>= 8; i -= 1 }
    i = 15
    while (i >= 8) { nsBytes(i) = (ls & 0xFF).toByte; ls >>>= 8; i -= 1 }

    val md = MessageDigest.getInstance("SHA-1")
    md.update(nsBytes)
    md.update(name.getBytes)
    val h = md.digest()

    h(6) = ((h(6) & 0x0F) | 0x50).toByte
    h(8) = ((h(8) & 0x3F) | 0x80).toByte

    val out = new Array[Char](36)
    var p = 0
    i = 0
    while (i < 16) {
      if (p == 8 || p == 13 || p == 18 || p == 23) { out(p) = '-'; p += 1 }
      out(p) = HexChars((h(i) >> 4) & 0xF); p += 1
      out(p) = HexChars(h(i) & 0xF); p += 1
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** Register `uuid5(namespace, name)` for SQL and Column use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "uuid5", exprs => Uuid5(exprs.head, exprs(1)), "built-in")
}
