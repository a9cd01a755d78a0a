package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CmsEstimate expression: hashing parity with the count_min_sketch
  * aggregate (the UTF-8-bytes add path), the never-underestimates CMS
  * property on exact data, and interpreted/codegen agreement.
  */
class CmsEstimateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("probing the aggregate's sketch never underestimates exact counts") {
    val words = Seq.tabulate(1000)(i => s"w${i % 37}").toDF("w")
    val sk = words.agg(
      count_min_sketch(col("w"), lit(0.001d), lit(0.99d), lit(42)).as("cms"))
    val got = words.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(sk))
      .select(col("w"), col("cnt"),
        GraftFunctions.cmsEstimate(col("cms"), col("w")).as("est"))
      .collect()
    assert(got.length === 37)
    got.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS underestimated ${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
  }

  test("expression matches a driver-side CountMinSketch probe bit-for-bit") {
    // build the same sketch by hand via the public sketch API, using
    // the UTF-8 binary add path the aggregate uses
    val cms = CountMinSketch.create(0.001d, 0.99d, 42)
    val items = Seq("alpha", "beta", "beta", "gamma", "gamma", "gamma")
    items.foreach(w => cms.addBinary(UTF8String.fromString(w).getBytes))
    val out = new ByteArrayOutputStream()
    cms.writeTo(out)
    val bytes = out.toByteArray
    val got = Seq("alpha", "beta", "gamma", "absent")
      .toDF("w").withColumn("sk", lit(bytes))
      .select(GraftFunctions.cmsEstimate(col("sk"), col("w")))
      .collect().map(_.getLong(0)).toSeq
    val want = Seq("alpha", "beta", "gamma", "absent")
      .map(w => cms.estimateCount(UTF8String.fromString(w).getBytes))
    assert(got === want)
    assert(want.take(3) === Seq(1L, 2L, 3L)) // no collisions at this size
  }

  test("interpreted eval agrees with codegen; nulls propagate") {
    val cms = CountMinSketch.create(0.01d, 0.9d, 7)
    cms.addBinary(UTF8String.fromString("x").getBytes)
    val bytes = cms.toByteArray
    val df = Seq(("x", true), ("y", true)).toDF("w", "dummy")
      .withColumn("sk", lit(bytes))
    val viaCodegen = df.select(GraftFunctions.cmsEstimate(col("sk"), col("w")))
      .collect().map(_.getLong(0)).toSeq
    val expr = CmsEstimate(
      org.apache.spark.sql.catalyst.expressions.Literal(bytes),
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString("x"),
        org.apache.spark.sql.types.StringType))
    val interpreted = expr.eval(null).asInstanceOf[Long]
    assert(viaCodegen.head === interpreted)
    assert(viaCodegen === Seq(1L, 0L))

    val withNull = Seq(Option.empty[String]).toDF("w")
      .withColumn("sk", lit(bytes))
      .select(GraftFunctions.cmsEstimate(col("sk"), col("w")))
      .collect()(0)
    assert(withNull.isNullAt(0))
  }
}
