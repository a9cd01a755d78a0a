package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("z-value interleaves bits (known vectors) and preserves cell order") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 5L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    // interleave: z(1,0)=1, z(0,1)=2, z(1,1)=3, z(2,2)=12, z(3,5)=39
    assert(rows.toSeq === Seq(0L, 1L, 2L, 3L, 12L, 0x27L))
  }

  // Any layout's average box AREA is ~domain/numFiles — the z-order
  // win is per-DIMENSION span: a single-key slab layout spans the
  // full second dimension, so a predicate on that dimension touches
  // every file, while Morton boxes stay narrow in both. "Files a
  // stats-pruning reader must open" = distinct files containing
  // matching rows.
  test("z-order prunes files under single-dimension predicates on BOTH keys") {
    // sf0.01 + 64 files: enough curve granularity for the geometry to
    // show (at a handful of files every layout's boxes are coarse).
    // Measured: z=(27, 21) slab=(9, 64) file-opens — the classic
    // z-order trade: slightly worse than the slab on ITS key, ~3x
    // better on the other, net win growing with file count.
    val orders = Tables.orders(spark, "/root/testdata/sf0.01")
      .select(col("o_custkey"), col("o_orderkey"))
    val n = 64
    val (cLo, cHi) = (600L, 787L)    // ~1/8 of the custkey range
    val (oLo, oHi) = (6000L, 7875L)  // ~1/8 of the orderkey range

    def filesTouched(write: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : (Long, Long) = {
      val out = Files.createTempDirectory("graft_zorder").toString + "/t"
      write(orders).write.parquet(out)
      val back = spark.read.parquet(out).withColumn("f", input_file_name())
      def touched(p: org.apache.spark.sql.Column): Long =
        back.filter(p).select(col("f")).distinct().count()
      (touched(col("o_custkey").between(cLo, cHi)),
        touched(col("o_orderkey").between(oLo, oHi)))
    }

    val (zByC, zByO) = filesTouched(df => ZOrder.layoutBy(df, "o_custkey", "o_orderkey", n))
    val (sByC, sByO) = filesTouched(df =>
      df.repartitionByRange(n, col("o_custkey")).sortWithinPartitions(col("o_custkey")))
    // the custkey slab layout answers custkey predicates perfectly but
    // touches EVERY file for an orderkey predicate
    assert(sByO.toInt === n, s"slab layout should touch all $n files, got $sByO")
    // Morton must beat it on the second dimension by a multiple...
    assert(zByO * 2 <= sByO, s"z-order files for orderkey pred: $zByO vs slab $sByO")
    // ...while staying bounded (boxes, not stripes) on the first
    assert(zByC < n, s"z-order files for custkey pred: $zByC of $n")
    // net: across the two single-dim predicates, strictly fewer opens
    assert(zByC + zByO < sByC + sByO,
      s"z-order total $zByC+$zByO vs slab $sByC+$sByO")
  }

  test("layout is a pure reordering — content identical") {
    val orders = Tables.orders(spark, TestSpark.SfDir)
      .select(col("o_custkey"), col("o_orderkey"))
    val before = orders.count()
    val laid = ZOrder.layoutBy(orders, "o_custkey", "o_orderkey", 4)
    assert(laid.count() === before)
    assert(laid.columns.toSeq === Seq("o_custkey", "o_orderkey"))
    assert(laid.except(orders).count() === 0 && orders.except(laid).count() === 0)
  }
}
