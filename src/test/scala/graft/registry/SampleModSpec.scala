package graft.registry

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale-adaptive slice divisor: the Scala function and the
  * SQL CASE ladder must agree at every threshold, and the tiers the
  * correctness records were graded at must keep their divisors
  * forever (a drift here silently invalidates every sampled-twin
  * record entry).
  */
class SampleModSpec extends AnyFunSuite {

  /** Reference evaluation of the generated CASE ladder. */
  private def ladder(n: Long, minMod: Int): Long = {
    val rungs = Iterator.iterate(minMod.toLong)(_ * 2)
      .takeWhile(_ < (1L << 35)).toSeq
    rungs.find(m => n <= SampleMod.TargetSlice * m).getOrElse(1L << 35)
  }

  test("record tiers keep their divisors bit-for-bit") {
    // docs: sf0.01=500, seeds~500, sf0.1=5714, 10x=57140 -> all 8
    for (n <- Seq(500L, 5714L, 57140L, 65536L))
      assert(SampleMod.of(n, 8) === 8L, s"docs n=$n")
    // embeddings: sf0.01=200, sf0.1=2000, 10x=20000 -> all 16
    for (n <- Seq(200L, 2000L, 20000L, 131072L))
      assert(SampleMod.of(n, 16) === 16L, s"emb n=$n")
    // the 100x tiers that motivated adaptivity
    assert(SampleMod.of(500000L, 8) === 64L)   // sf100docs
    assert(SampleMod.of(200000L, 16) === 32L)  // sf100emb
  }

  test("Scala function and SQL ladder agree at and around every threshold") {
    for (minMod <- Seq(8, 16); k <- 0 to 20) {
      val m = minMod.toLong << k
      val boundary = SampleMod.TargetSlice * m
      for (n <- Seq(boundary - 1, boundary, boundary + 1))
        assert(SampleMod.of(n, minMod) === ladder(n, minMod),
          s"minMod=$minMod n=$n")
    }
  }

  test("slice stays within target above the minimum divisor") {
    for (n <- Seq(70000L, 500000L, 5000000L, 50000000L, 500000000L)) {
      val m = SampleMod.of(n, 8)
      assert(n / m <= SampleMod.TargetSlice, s"n=$n m=$m")
      assert(m >= 8 && java.lang.Long.bitCount(m) == 1, s"power of two: $m")
    }
  }

  test("generated SQL embeds the same integer thresholds") {
    val sql = SampleMod.modCte("documents", 8)
    assert(sql.contains(s"WHEN n <= ${SampleMod.TargetSlice * 8} THEN 8"))
    assert(sql.contains(s"WHEN n <= ${SampleMod.TargetSlice * 64} THEN 64"))
    assert(sql.contains("FROM documents"))
    assert(!sql.trim.endsWith(","))
    val pred = SampleMod.slicePredicate("h64")
    assert(pred.contains("(SELECT m FROM smod)"))
  }
}
