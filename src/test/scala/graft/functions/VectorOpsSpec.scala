package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** DotProduct expression: bit-parity with the higher-order-function
  * form it replaces, identical interpreted and codegen paths, and the
  * zip_with poison semantics on ragged/null input.
  */
class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("matches the zip_with+aggregate form bit-exactly on float arrays") {
    val df = graft.Tables.embeddings(spark, graft.TestSpark.SfDir)
      .select(col("embedding").as("a"),
        reverse(col("embedding")).as("b"))
    val mismatches = df.select(
      GraftFunctions.dotProduct(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches === 0)
  }

  test("double arrays, empty arrays, nulls, ragged lengths") {
    val rows = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),   // 32.0
      (Seq.empty[Double], Seq.empty[Double]))      // 0.0
      .toDF("a", "b")
    val got = rows.select(GraftFunctions.dotProduct(col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(Some(32.0), Some(0.0)))

    // ragged lengths poison to null (zip_with pads with null)
    val ragged = Seq((Seq(1.0, 2.0), Seq(1.0)))
      .toDF("a", "b")
      .select(GraftFunctions.dotProduct(col("a"), col("b")).as("d"),
        hofDot(col("a"), col("b")).as("h"))
      .collect()(0)
    assert(ragged.isNullAt(0) && ragged.isNullAt(1))

    // null array -> null
    val nullArr = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(GraftFunctions.dotProduct(col("a"), col("b")))
      .collect()(0)
    assert(nullArr.isNullAt(0))
  }

  test("interpreted and codegen paths agree") {
    val df = Seq((Seq(1.5f, -2.5f, 3.25f), Seq(0.5f, 4.0f, -1.0f))).toDF("a", "b")
    val expr = GraftFunctions.dotProduct(col("a"), col("b"))
    val viaCodegen = df.select(expr).collect()(0).getDouble(0)
    // force the interpreted path through eval()
    val boundRow = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1.5f, -2.5f, 3.25f)),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(0.5f, 4.0f, -1.0f)))
    val interpreted = DotProduct(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType), true),
      org.apache.spark.sql.catalyst.expressions.BoundReference(1,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType), true))
      .eval(boundRow).asInstanceOf[Double]
    assert(viaCodegen === interpreted)
    assert(math.abs(viaCodegen - (1.5 * 0.5 + -2.5 * 4.0 + 3.25 * -1.0)) < 1e-12)
  }
}
