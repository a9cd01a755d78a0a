package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Runtime bloom-filter join pruning (Catalyst's InjectRuntimeFilter):
  * a selective filter on the dim side gets turned into a bloom filter
  * applied to the fact scan BEFORE the join shuffle — at 100 TB this
  * is the difference between shuffling the whole fact table and
  * shuffling the ~matching fraction. The production thresholds
  * (10 GB application-side scan) are sized for clusters; the spec
  * tunes them down in a cloned session to prove the mechanism and the
  * result equivalence on the fixture.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("selective dim filter injects a bloom filter on the fact side") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    val sf = TestSpark.SfDir
    val lineitem = Tables.lineitem(s2, sf).select(col("l_orderkey"), col("l_extendedprice"))
    val urgent = Tables.orders(s2, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"))
    val joined = lineitem.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("bloomfilter") || plan.contains("might_contain"),
      s"no runtime bloom filter injected:\n$plan")

    // and the filter is transparent: same result as a vanilla session
    val vanilla = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_extendedprice"))
      .join(Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
      .head
    val tuned = joined.head
    assert(tuned.getLong(0) === vanilla.getLong(0))
    assert(math.abs(tuned.getDouble(1) - vanilla.getDouble(1)) < 1e-6)
  }
}
