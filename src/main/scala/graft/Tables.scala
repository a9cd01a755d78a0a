package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed readers for the driver-generated star schema (TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst can push filters and
  * prune columns down to the file scan — at 100 TB the scan is the
  * dominant cost and `PushedFilters`/`ReadSchema` must stay tight.
  */
object Tables {
  import org.apache.spark.sql.types._

  /** Canonical numeric types per table, matching the driver's shipped
    * schema. Fixture regenerations have flipped writer-side physical
    * types before (the round-6 TIMESTAMP_NTZ drift); a width flip on an
    * id column is the same threat for every hash-bearing oracle —
    * `xxhash64(int)` and `xxhash64(bigint)` hash different byte widths,
    * so an int32 `doc_id` would silently break every minhash/LSH/
    * winnowing twin. Normalizing on read keeps query results a function
    * of the VALUES, not the writer's encoding choices. All casts here
    * are exact widenings (int→long, float→double are value-preserving
    * IEEE/integral embeddings), never narrowing.
    */
  private val canonicalNumerics: Map[String, Map[String, DataType]] = Map(
    "region"   -> Map("r_regionkey" -> IntegerType),
    "nation"   -> Map("n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType,
                      "c_acctbal" -> DoubleType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
                      "s_acctbal" -> DoubleType),
    "part"     -> Map("p_partkey" -> LongType, "p_size" -> IntegerType,
                      "p_retailprice" -> DoubleType),
    "orders"   -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
                      "o_totalprice" -> DoubleType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
                      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
                      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
                      "l_discount" -> DoubleType, "l_tax" -> DoubleType),
    "events"   -> Map("event_id" -> LongType, "user_id" -> LongType,
                      "value" -> DoubleType),
    "documents" -> Map("doc_id" -> LongType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType, "label" -> IntegerType),
  )

  private val widenable: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)

  /** Cast any column whose read type differs from its canonical numeric
    * type, provided both are plain numerics (a decimal or string writer
    * layout would deserve its own audited arm, not a blind cast).
    */
  private def normalizeNumerics(df: DataFrame, name: String): DataFrame =
    canonicalNumerics.get(name).fold(df) { m =>
      m.foldLeft(df) { case (d, (cName, want)) =>
        d.schema.fields.find(_.name == cName) match {
          case Some(f) if f.dataType != want && widenable(f.dataType) =>
            d.withColumn(cName, org.apache.spark.sql.functions.col(cName).cast(want))
          case _ => d
        }
      }
    }

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNumerics(spark.read.parquet(s"$dir/$name.parquet"), name)

  def region(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read it as raw nanos (legacy conf) and
    * rebuild a micros timestamp with integer division — `DIV` not `/`,
    * since double division loses precision above 2^53 ns.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, dir, "events")
    // Replicated fixtures (tools.ReplicateSf) store ts as a plain micros
    // TIMESTAMP — only the raw-nanos layout needs the rebuild.
    // Driver regenerations have also shipped plain-micros files with no UTC
    // flag, which Spark 4 reads as TIMESTAMP_NTZ; `unix_micros` and the
    // interval-join arithmetic require TIMESTAMP. The session TZ is pinned
    // UTC, so the cast is a metadata-only relabel (bit-identical values).
    // Schema-on-read must tolerate writer variance across all three layouts.
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
