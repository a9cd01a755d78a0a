package graft.registry

/** Scale-adaptive slice divisor for the `_sampled` scale-twin queries.
  *
  * The sampled twins exist so every full-scale query keeps a tractable
  * COMPLETE DuckDB replay at replica scale. A FIXED divisor breaks that
  * promise one decade up: at the 100× documents replica a 1/8 slice is
  * ~71k docs — larger than the whole 10× corpus — and the uncapped
  * exact-Jaccard twin over it spilled >62 GB without finishing. The
  * divisor therefore DERIVES from the corpus row count, identically on
  * both engines, targeting a slice of at most 8192 rows: the smallest
  * power-of-two `m >= minMod` with `n <= 8192 * m`.
  *
  * Chosen so every tier the records were graded at keeps its current
  * divisor (sf0.01/sf0.1/10×/seeds: docs ≤ 65536 → 8; embeddings
  * ≤ 131072 → 16) — only the 100× tier, where the fixed divisor was
  * intractable, changes (500k docs → 64; 200k vectors → 32).
  *
  * The Spark side computes `of(n)` from a driver-side count (a cheap
  * metadata-bounded aggregate); the twin replays the SAME arithmetic as
  * a CASE ladder over COUNT(*) — integer thresholds, no float log2, so
  * the two sides cannot round apart.
  */
object SampleMod {

  val TargetSlice = 8192L

  /** Largest rung in the SQL ladder (n up to ~2.8e14 rows). */
  private val MaxMod = 1L << 35

  def of(n: Long, minMod: Int): Long = {
    var m = minMod.toLong
    while (n > TargetSlice * m && m < MaxMod) m *= 2
    m
  }

  /** A CTE `<name> AS (SELECT <ladder> AS m FROM (SELECT COUNT(*) AS n
    * FROM <table>))` computing exactly [[of]]. Ends WITHOUT a trailing
    * comma; splice into a WITH chain.
    */
  def modCte(table: String, minMod: Int, name: String = "smod"): String = {
    val rungs = Iterator.iterate(minMod.toLong)(_ * 2)
      .takeWhile(_ < MaxMod).toSeq
    val whens = rungs
      .map(m => s"WHEN n <= ${TargetSlice * m} THEN $m")
      .mkString("\n|    ")
    s"""$name AS (
       |  SELECT CASE
       |    $whens
       |    ELSE $MaxMod END AS m
       |  FROM (SELECT COUNT(*) AS n FROM $table))""".stripMargin
  }

  /** Sign-safe `hash % m == 0` predicate against the [[modCte]] CTE. */
  def slicePredicate(hashCol: String, name: String = "smod"): String = {
    val m = s"(SELECT m FROM $name)"
    s"(($hashCol % $m) + $m) % $m = 0"
  }
}
