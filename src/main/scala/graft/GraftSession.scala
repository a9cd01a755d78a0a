package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended scale configuration.
  * Callers still own master/memory; these are the knobs that change
  * plan quality at 100 TB.
  */
object GraftSession {

  def builder(shufflePartitions: Int = 0): SparkSession.Builder = {
    val b = SparkSession.builder()
      .config("spark.sql.adaptive.enabled", "true")
      // AQE skew split + coalesce do the right thing at runtime for
      // uneven key distributions the planner can't see.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // keep scans splittable-friendly: many medium partitions beat
      // few giant ones for CPU-heavy derived columns
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .withExtensions(new plans.GraftExtensions)
    if (shufflePartitions > 0)
      b.config("spark.sql.shuffle.partitions", shufflePartitions)
    b
  }
}
