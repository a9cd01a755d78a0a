package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Runtime skew handling: salting (`skew_salted_join`) is the manual
  * lever; this spec proves the AQE lever — a sort-merge join whose one
  * hot key dwarfs every other partition gets its skewed partition
  * SPLIT at runtime (OptimizeSkewedJoin), with the same join result.
  * At 100 TB both levers matter: AQE for discovered skew, salting for
  * known-hot keys that must also aggregate.
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AQE splits the skewed partition of a hot-key sort-merge join") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // keep AQE from collapsing everything into one partition first
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key (0) carries 100k fact rows with a wide payload;
      // 99 cold keys carry 100 each
      val facts = spark.range(0, 109900).select(
        when(col("id") < 100000, 0L).otherwise((col("id") % 99) + 1).as("k"),
        concat(lit("payload_"), col("id"),
          lit("x" * 64)).as("payload"))
      val dim = (0L to 99L).toDF("k").withColumn("label", concat(lit("dim_"), col("k")))
      val joined = facts.join(dim.hint("merge"), "k")
      // drive THIS plan instance to completion (a .count() would build
      // and execute a separate QueryExecution), then read the final
      // adaptive plan off it
      val qe = joined.queryExecution
      val n = qe.executedPlan.execute().count()
      assert(n === 109900L)
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
