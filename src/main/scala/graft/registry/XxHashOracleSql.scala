package graft.registry

/** DuckDB-SQL builders replaying Spark's `xxhash64` exactly (XXH64,
  * seed 42, signed-long output), so the xxhash64-based scale operators
  * (MinHash banding, SimHash, winnowing) can carry FULL oracles instead
  * of rows-only checks.
  *
  * DuckDB 1.0 has no xxhash; worse, its 64-bit arithmetic overflow-
  * checks instead of wrapping. Every multiply/add/shift here routes
  * through UHUGEINT with an explicit mod-2^64, and values are carried
  * as UBIGINT between steps. Two shapes:
  *
  *  - [[longHashCte]]: XXH64 of ONE 8-byte little-endian long (the
  *    hash-at-index rehash) — no stripes, a pure 13-step scalar chain
  *    emitted as DuckDB lateral column aliases (no exponential
  *    expression blowup, no recursion);
  *  - [[stringHashCtes]]: general XXH64 over UTF-8 bytes of a string
  *    column with a per-row seed — 32-byte stripes via a recursive
  *    CTE, then the 8/4/1-byte tail, mirroring the reference
  *    algorithm Spark implements.
  *
  * Seed chaining (`xxhash64(intLit, col)` = col hashed with seed =
  * hash(intLit, 42)) is CONSTANT-FOLDED at SQL-build time through
  * Spark's own `catalyst.expressions.XXH64`, which also guarantees the
  * constants can never drift from the engine.
  *
  * Validated end-to-end: Spark `xxhash64` vectors (empty/1/31/32/33/
  * multi-stripe/multibyte strings, int→long chains) == a Python
  * reference == this SQL, before the oracles below were wired.
  */
object XxHashOracleSql {

  private val M64 = "18446744073709551616" // 2^64
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"

  private def mul(a: String, b: String) =
    s"CAST((CAST(($a) AS UHUGEINT) * CAST(($b) AS UHUGEINT)) % $M64 AS UBIGINT)"
  private def add(a: String, b: String) =
    s"CAST((CAST(($a) AS UHUGEINT) + CAST(($b) AS UHUGEINT)) % $M64 AS UBIGINT)"
  private def shl(x: String, n: Int) =
    s"CAST((CAST(($x) AS UHUGEINT) * ${BigInt(1) << n}) % $M64 AS UBIGINT)"
  private def shr(x: String, n: Int) =
    s"(CAST(($x) AS UBIGINT) >> $n)"
  private def rot(x: String, n: Int) =
    s"(${shl(x, n)} | ${shr(x, 64 - n)})"
  private def xorU(a: String, b: String) =
    s"xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT))"

  /** Signed BIGINT → the same bit pattern as UBIGINT. */
  private def u64(x: String) =
    s"CAST((CAST(($x) AS HUGEINT) + $M64) % $M64 AS UBIGINT)"

  /** UBIGINT → signed BIGINT reinterpretation (Spark's return type). */
  private def toSigned(x: String) =
    s"(CASE WHEN ($x) >= 9223372036854775808 THEN CAST(CAST(($x) AS HUGEINT) - $M64 AS BIGINT) ELSE CAST(($x) AS BIGINT) END)"

  /** Spark's exact constant for `xxhash64(intLiteral, ...)` chaining:
    * the seed the second argument is hashed with.
    */
  def intSeed(i: Int): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 42L)

  /** A signed long as an unsigned UBIGINT SQL literal. */
  def uLit(v: Long): String = {
    val u = (BigInt(v) + (BigInt(1) << 64)) % (BigInt(1) << 64)
    s"CAST($u AS UBIGINT)"
  }

  /** The final avalanche, as chained aliases from `h`. */
  private def avalancheAliases(h: String, p: String): (String, String) = {
    val steps = Seq(
      s"${xorU(h, shr(h, 33))} AS ${p}f1",
      s"${mul(s"${p}f1", P2)} AS ${p}f2",
      s"${xorU(s"${p}f2", shr(s"${p}f2", 29))} AS ${p}f3",
      s"${mul(s"${p}f3", P3)} AS ${p}f4",
      s"${xorU(s"${p}f4", shr(s"${p}f4", 32))} AS ${p}f5")
    (steps.mkString(",\n    "), s"${p}f5")
  }

  /** CTE computing XXH64 of an 8-byte little-endian long per row.
    *
    * Each hash step is one nested-subquery level (`SELECT *, expr AS
    * a_i FROM (...)`) so every intermediate is a real projected column
    * computed once. DuckDB expands LATERAL column aliases by inlining
    * the defining expression at every reference — a 13-step chain of
    * aliases (each referenced twice by the rotations) would blow up to
    * ~2^13 arithmetic ops per row.
    *
    * @param name     CTE name to emit
    * @param fromSql  relation to read (`FROM $fromSql`)
    * @param keep     columns to carry through
    * @param valueExpr signed-BIGINT SQL expression for the long input
    * @param seedExpr UBIGINT SQL expression for the seed
    * @param out      output column name (signed BIGINT)
    */
  def longHashCte(name: String, fromSql: String, keep: Seq[String],
                  valueExpr: String, seedExpr: String, out: String): String = {
    val p = s"_${name}_"
    val steps: Seq[(String, String)] = Seq(
      s"${p}a1" -> mul(s"${p}v", P2),
      s"${p}a2" -> rot(s"${p}a1", 31),
      s"${p}a3" -> mul(s"${p}a2", P1),
      s"${p}h1" -> xorU(s"${p}h0", s"${p}a3"),
      s"${p}h2" -> rot(s"${p}h1", 27),
      s"${p}h3" -> add(mul(s"${p}h2", P1), P4),
      s"${p}f1" -> xorU(s"${p}h3", shr(s"${p}h3", 33)),
      s"${p}f2" -> mul(s"${p}f1", P2),
      s"${p}f3" -> xorU(s"${p}f2", shr(s"${p}f2", 29)),
      s"${p}f4" -> mul(s"${p}f3", P3),
      s"${p}f5" -> xorU(s"${p}f4", shr(s"${p}f4", 32)))
    val base =
      s"""SELECT ${keep.mkString(", ")}, ${u64(valueExpr)} AS ${p}v,
         |      ${add(add(seedExpr, P5), "8")} AS ${p}h0 FROM $fromSql""".stripMargin
    val nested = steps.foldLeft(base) { case (inner, (alias, expr)) =>
      s"SELECT *, $expr AS $alias FROM (\n$inner)"
    }
    s"""$name AS (
       |  SELECT ${keep.mkString(", ")}, ${toSigned(s"${p}f5")} AS $out FROM (
       |$nested))""".stripMargin
  }

  /** CTE chain computing XXH64 over the UTF-8 bytes of a string, with
    * a per-row seed. Reads a CTE `${prefix}_src(xid, s, useed)` (xid
    * unique, s VARCHAR, useed UBIGINT) and emits CTEs ending
    * `${prefix}_out(xid, hash64)` (signed BIGINT). Embed under
    * `WITH RECURSIVE`.
    */
  def stringHashCtes(prefix: String): String = {
    val x = prefix
    // little-endian uint from nbytes of lower-hex `hx` at 0-based byte
    // offset `off` (a SQL expression)
    def le(hx: String, off: String, nbytes: Int): String = {
      val terms = (0 until nbytes).map { j =>
        val b = s"(strpos('0123456789abcdef', substr($hx, ($off)*2 + ${2 * j + 1}, 1))-1)*16 + " +
          s"(strpos('0123456789abcdef', substr($hx, ($off)*2 + ${2 * j + 2}, 1))-1)"
        s"CAST(($b) AS UHUGEINT) * ${BigInt(1) << (8 * j)}"
      }
      s"CAST((${terms.mkString(" + ")}) % $M64 AS UBIGINT)"
    }
    def roundAcc(acc: String, lane: String) = mul(rot(add(acc, mul(lane, P2)), 31), P1)
    def mergeAcc(h: String, v: String) =
      add(mul(xorU(h, mul(rot(mul(v, P2), 31), P1)), P1), P4)
    val lane = (k: Int) => le("p.hx", s"t.i + $k", 8)
    val v10 = add(add("p.useed", P1), P2)
    val v20 = add("p.useed", P2)
    val v30 = "p.useed"
    val v40 = s"CAST((CAST(p.useed AS UHUGEINT) + $M64 - CAST($P1 AS UHUGEINT)) % $M64 AS UBIGINT)"
    val stripeMerge = mergeAcc(mergeAcc(mergeAcc(mergeAcc(
      add(add(rot("t.v1", 1), rot("t.v2", 7)), add(rot("t.v3", 12), rot("t.v4", 18))),
      "t.v1"), "t.v2"), "t.v3"), "t.v4")
    val (avalanche, last) = avalancheAliases("hq", "_av_")
    s"""${x}_init AS MATERIALIZED (
       |  SELECT xid, lower(hex(encode(s))) AS hx, octet_length(encode(s)) AS ln,
       |         useed, CAST(octet_length(encode(s)) // 32 AS BIGINT) AS nstripes
       |  FROM ${x}_src),
       |${x}_stripes(xid, i, stp, v1, v2, v3, v4) AS (
       |  SELECT xid, CAST(0 AS BIGINT), CAST(0 AS BIGINT), $v10, $v20, $v30, $v40
       |  FROM ${x}_init p WHERE nstripes > 0
       |  UNION ALL
       |  SELECT t.xid, t.i + 32, t.stp + 1,
       |    ${roundAcc("t.v1", lane(0))}, ${roundAcc("t.v2", lane(8))},
       |    ${roundAcc("t.v3", lane(16))}, ${roundAcc("t.v4", lane(24))}
       |  FROM ${x}_stripes t JOIN ${x}_init p ON p.xid = t.xid
       |  WHERE t.stp < p.nstripes),
       |${x}_merged AS (
       |  SELECT t.xid, t.i, $stripeMerge AS h
       |  FROM ${x}_stripes t JOIN ${x}_init p ON p.xid = t.xid
       |  WHERE t.stp = p.nstripes
       |  UNION ALL
       |  SELECT xid, 0, ${add("useed", P5)} AS h FROM ${x}_init WHERE nstripes = 0),
       |${x}_len AS (
       |  SELECT m.xid, m.i, p.hx, p.ln, ${add("m.h", "p.ln")} AS h
       |  FROM ${x}_merged m JOIN ${x}_init p ON p.xid = m.xid),
       |${x}_tail8(xid, i, hx, ln, h) AS (
       |  SELECT xid, i, hx, ln, h FROM ${x}_len
       |  UNION ALL
       |  SELECT xid, i + 8, hx, ln,
       |    ${add(mul(rot(xorU("h", mul(rot(mul(le("hx", "i", 8), P2), 31), P1)), 27), P1), P4)}
       |  FROM ${x}_tail8 WHERE i + 8 <= ln),
       |${x}_after8 AS (
       |  SELECT xid, i, hx, ln, h FROM ${x}_tail8 WHERE i + 8 > ln),
       |${x}_after4 AS (
       |  SELECT xid,
       |    CASE WHEN i + 4 <= ln THEN i + 4 ELSE i END AS i, hx, ln,
       |    CASE WHEN i + 4 <= ln
       |      THEN ${add(mul(rot(xorU("h", mul(le("hx", "i", 4), P1)), 23), P2), P3)}
       |      ELSE h END AS h
       |  FROM ${x}_after8),
       |${x}_bytes(xid, i, hx, ln, h) AS (
       |  SELECT xid, i, hx, ln, h FROM ${x}_after4
       |  UNION ALL
       |  SELECT xid, i + 1, hx, ln,
       |    ${mul(rot(xorU("h", mul(le("hx", "i", 1), P5)), 11), P1)}
       |  FROM ${x}_bytes WHERE i < ln),
       |${x}_out AS (
       |  SELECT xid, ${toSigned(last)} AS hash64 FROM (
       |    SELECT xid, h AS hq,
       |    $avalanche
       |    FROM ${x}_bytes WHERE i = ln))""".stripMargin
  }
}
