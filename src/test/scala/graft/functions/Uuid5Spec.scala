package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Byte-parity with Python `uuid.uuid5` (expected values captured by
  * running the reference's `generate_company_id`) + RFC 4122 shape.
  */
class Uuid5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vectors = Map(
    "broadband dynamics" -> "869d9876-ec7b-5fab-ba2a-ccb08f70571f",
    "stratus networks" -> "a4c7804c-7241-5a32-88a5-314c10dd6633",
    "test telecom" -> "ee0d7101-b1a2-5ca0-9fbd-48c290cf0523",
    "" -> "4ebd0208-8328-5d69-8c44-ec50939c0967")

  test("uuid5 matches Python uuid.uuid5 vectors (codegen path)") {
    val got = vectors.keys.toSeq.toDF("name")
      .select(col("name"), GraftFunctions.uuid5(col("name")).as("id"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === vectors)
  }

  test("uuid5 interpreted path matches codegen path") {
    import org.apache.spark.unsafe.types.UTF8String
    vectors.foreach { case (name, expected) =>
      val got = Uuid5.compute(
        UTF8String.fromString(Uuid5.NamespaceDns),
        UTF8String.fromString(name)).toString
      assert(got === expected)
    }
  }

  test("uuid5 has version 5 and RFC variant bits for arbitrary input") {
    val ids = (1 to 200).map(i => s"entity $i").toDF("name")
      .select(GraftFunctions.uuid5(col("name")).as("id"))
      .collect().map(_.getString(0))
    ids.foreach { id =>
      assert(id.length === 36)
      assert(id(14) === '5', s"version nibble in $id")
      assert("89ab".contains(id(19)), s"variant in $id")
    }
    assert(ids.distinct.length === 200)
  }

  test("uuid5 of null is null") {
    val r = Seq((1, Option.empty[String])).toDF("i", "name")
      .select(GraftFunctions.uuid5(col("name")).as("id"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("uuid5 registered for SQL") {
    Uuid5.register(spark)
    val got = spark.sql(
      s"SELECT uuid5('${Uuid5.NamespaceDns}', 'broadband dynamics') AS id")
      .collect()(0).getString(0)
    assert(got === vectors("broadband dynamics"))
  }
}
