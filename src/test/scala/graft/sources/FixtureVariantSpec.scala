package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** Whole-surface schema-on-read tolerance: every registered query must
  * ANALYZE against realistic writer-variant fixture layouts.
  *
  * FixtureToleranceSpec covers the one drift that actually bit (the
  * events TIMESTAMP_NTZ regeneration) in depth; this spec generalizes
  * the lesson to the rest of the star schema. A driver fixture
  * regeneration owns the writer, so any value-preserving physical
  * encoding — int32 vs int64 ids, float32 vs float64 measures, DATE vs
  * TIMESTAMP date columns, DOUBLE vs FLOAT embeddings — is a layout we
  * may be handed next round. `Tables` normalizes numeric widths to the
  * canonical schema on read (exact widenings only), so every query
  * sees one schema no matter which of these layouts shipped.
  *
  * Analysis is asserted for the full registry (catches strictly-typed
  * expression arms like `unix_micros`, the round-6 failure mode, at
  * spec time instead of correctness-artifact time). Value identity is
  * asserted for a hash-bearing query on the narrowed layout — width
  * normalization is exactly what keeps xxhash64-based oracles layout
  * independent (xxhash64 hashes the physical width: int32 doc_ids
  * would otherwise change every minhash/winnowing fingerprint).
  */
class FixtureVariantSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val tableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def canonicalRead(name: String): DataFrame = name match {
    case "events" => Tables.events(spark, TestSpark.SfDir)
    case n        => spark.read.parquet(s"${TestSpark.SfDir}/$n.parquet")
  }

  /** Narrow every 64-bit numeric to its 32-bit layout (values at
    * sf0.001 all fit), preserving values exactly.
    */
  private def narrowed(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case LongType   => d.withColumn(f.name, col(f.name).cast(IntegerType))
        case DoubleType => d // float32 narrowing is NOT value-preserving;
                            // measures get their own variant below
        case _ => d
      }
    }

  /** Columns Tables normalizes for this table, keyed by canonical
    * type — the set a decimal/varchar writer layout may legally alter
    * (anything outside it would reach queries unnormalized).
    */
  private def canonicalCols(name: String): Map[String, DataType] =
    Tables.canonicalNumerics.getOrElse(name, Map.empty)

  private val integralTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  private def variant(layout: String, name: String, df: DataFrame): DataFrame =
    layout match {
      case "narrow-ints" => narrowed(df)
      // NUMBER-style export layout (Oracle/Snowflake writers ship
      // integral keys as DECIMAL): every canonical-integral column as
      // DECIMAL(18,0) — value-preserving, so Tables' checked cast must
      // restore canonical types with identical values.
      case "decimal-ids" =>
        canonicalCols(name).foldLeft(df) { case (d, (c, want)) =>
          if (integralTypes(want)) d.withColumn(c, col(c).cast(DecimalType(18, 0)))
          else d
        }
      // CSV-ish stringly layout: every canonical numeric as VARCHAR.
      // Integral strings round-trip exactly; double strings parse back
      // bit-identically (Java shortest-round-trip formatting).
      case "varchar-nums" =>
        canonicalCols(name).foldLeft(df) { case (d, (c, _)) =>
          d.withColumn(c, col(c).cast(StringType))
        }
      case "date32" => name match {
        case "orders"   => df.withColumn("o_orderdate", col("o_orderdate").cast(DateType))
        case "lineitem" => df.withColumn("l_shipdate", col("l_shipdate").cast(DateType))
        case _ => df
      }
      case "tz-ts" =>
        df.schema.fields.foldLeft(df) { (d, f) =>
          if (f.dataType == TimestampNTZType)
            d.withColumn(f.name, col(f.name).cast(TimestampType))
          else d
        }
      // The round-6 drift class, applied to EVERY canonical timestamp
      // column (not just events.ts): a regeneration that drops the UTC
      // flag ships TIMESTAMP_NTZ. Session TZ is pinned UTC, so the
      // on-disk micros are identical — Tables must relabel on read.
      case "ntz-ts" =>
        Tables.canonicalTimestamps.getOrElse(name, Nil).foldLeft(df) {
          (d, c) =>
            if (d.schema.fieldNames.contains(c))
              d.withColumn(c, col(c).cast(TimestampNTZType))
            else d
        }
      case "double-emb" => name match {
        case "embeddings" =>
          df.withColumn("embedding", transform(col("embedding"), _.cast(DoubleType)))
        case _ => df
      }
    }

  private def writeVariant(layout: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-variant-$layout").toString
    for (name <- tableNames)
      variant(layout, name, canonicalRead(name))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    dir
  }

  for (layout <- Seq("narrow-ints", "date32", "tz-ts", "ntz-ts", "double-emb",
                     "decimal-ids", "varchar-nums")) {
    test(s"all registered queries analyze against the $layout fixture layout") {
      val dir = writeVariant(layout)
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        try {
          fn(spark, dir).queryExecution.assertAnalyzed()
          None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage.take(200)}")
        }
      }
      assert(failures.isEmpty,
        s"$layout: ${failures.size} queries failed analysis:\n${failures.mkString("\n")}")
    }
  }

  for (layout <- Seq("narrow-ints", "decimal-ids", "varchar-nums")) {
    test(s"hash-bearing results are identical on the $layout layout") {
      val dir = writeVariant(layout)
      for (q <- Seq("dedup_minhash", "text_winnow_fingerprint")) {
        val want = SparkEntry.queries(q)(spark, TestSpark.SfDir)
        val got = SparkEntry.queries(q)(spark, dir)
        assert(got.schema == want.schema, s"$q: schema drifted on $layout layout")
        assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
          s"$q: values drifted on $layout layout — normalization broken")
      }
    }
  }

  // Timestamp-layout identity: DATE is exact (fixture dates are
  // midnight-only, and a date32 has no time to lose) and NTZ is a
  // UTC relabel of the same micros — every timestamp-consuming query
  // must return identical values on either drifted layout.
  for (layout <- Seq("date32", "ntz-ts")) {
    test(s"timestamp-consuming results are identical on the $layout layout") {
      val dir = writeVariant(layout)
      for (q <- Seq("a5_max_date", "w5_latest_run")) {
        val want = SparkEntry.queries(q)(spark, TestSpark.SfDir)
        val got = SparkEntry.queries(q)(spark, dir)
        assert(got.schema == want.schema, s"$q: schema drifted on $layout layout")
        assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
          s"$q: values drifted on $layout layout — normalization broken")
      }
    }
  }

  /** The guard's OTHER contract: a layout the cast would corrupt must
    * throw at scan time, never wrap/truncate silently. Each poison
    * table is the real fixture with one value the canonical cast
    * cannot preserve.
    */
  private def writePoison(mutate: DataFrame => DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-poison").toString
    mutate(canonicalRead("nation"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/nation.parquet")
    dir
  }

  private def expectRaise(dir: String): Unit = {
    val e = intercept[Exception] {
      Tables.nation(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("[graft.Tables]")),
      s"expected the value-preservation guard to raise, got: $e")
  }

  test("int64-for-int32 writer layout with an overflowing value throws (no silent wrap)") {
    expectRaise(writePoison(df =>
      df.withColumn("n_nationkey",
        when(col("n_nationkey") === 0, lit(1L << 35))
          .otherwise(col("n_nationkey").cast(LongType)))))
  }

  test("fractional DECIMAL for an integral column throws (no silent truncation)") {
    expectRaise(writePoison(df =>
      df.withColumn("n_nationkey",
        (col("n_nationkey").cast(DecimalType(12, 2)) + lit(0.5))
          .cast(DecimalType(12, 2)))))
  }

  test("non-integral VARCHAR for an integral column throws (no silent truncation)") {
    expectRaise(writePoison(df =>
      df.withColumn("n_nationkey",
        when(col("n_nationkey") === 0, lit("7.5"))
          .otherwise(col("n_nationkey").cast(StringType)))))
  }

  test("unparseable VARCHAR for an integral column throws (no silent null)") {
    expectRaise(writePoison(df =>
      df.withColumn("n_nationkey",
        when(col("n_nationkey") === 0, lit("oops"))
          .otherwise(col("n_nationkey").cast(StringType)))))
  }
}
