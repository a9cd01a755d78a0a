package graft.registry

/** DuckDB-SQL fragment builders for oracles that need algorithms DuckDB
  * 1.0.0 lacks as built-ins, replayed exactly with recursive CTEs:
  *
  *  - SHA-1 (no `sha1()` there) → RFC-4122 v5 UUIDs, bit-parity with
  *    `graft.functions.Uuid5` / Python's `uuid.uuid5`
  *    (reference: `code/structure_data.py:118-122`);
  *  - Ratcliff–Obershelp similarity (`difflib.SequenceMatcher.ratio`),
  *    bit-parity with `graft.functions.RatcliffObershelp`
  *    (reference: `code/structure_data.py:178,186`);
  *  - the full `FuzzyDedup.canonicalMap` pipeline (blocked candidate
  *    pairs → merge predicate → connected components, canonical = min
  *    name per component).
  *
  * These exist so the driver's DuckDB correctness gate can hash-match
  * queries whose Spark side uses the native expressions — they are NOT
  * execution paths of the library. Caveats: byte-oriented steps assume
  * the SQL's codepoint semantics == Java char semantics, i.e. ASCII
  * inputs (true for normalized entity names); uuid5 messages are capped
  * at 16 SHA-1 blocks (names ≤ ~1000 UTF-8 bytes).
  *
  * All fragments must be embedded under a `WITH RECURSIVE` header.
  */
object RecursiveOracleSql {

  /** RFC 4122 DNS namespace as raw hex (the 16 bytes SHA-1 is seeded
    * with), matching [[graft.functions.Uuid5.NamespaceDns]].
    */
  private val NsHex = "6BA7B8109DAD11D180B400C04FD430C8"

  // 32-bit rotations over BIGINT lanes. DuckDB gives `<<`/`>>`/`|`/`&`
  // ONE shared precedence level (left-assoc), so every operand is
  // parenthesized defensively.
  private def rotl1(x: String) =
    s"(((CAST(($x) AS BIGINT)*2) | (CAST(($x) AS BIGINT)>>31)) & 4294967295)"
  private def rotl5(x: String) =
    s"(((CAST(($x) AS BIGINT)<<5) | (CAST(($x) AS BIGINT)>>27)) & 4294967295)"
  private def rotl30(x: String) =
    s"(((CAST(($x) AS BIGINT)<<30) | (CAST(($x) AS BIGINT)>>2)) & 4294967295)"

  /** Big-endian 32-bit word from 8 hex chars of `s` starting at 1-based
    * position `off` (a SQL expression), via strpos nibble decode.
    */
  private def hexWord(s: String, off: String): String =
    (0 until 8).map { j =>
      val scale = BigInt(16).pow(7 - j)
      s"(strpos('0123456789ABCDEF', substr($s, ($off)+$j, 1))-1)*$scale"
    }.mkString("(", " + ", ")")

  /** CTE chain computing `uuid5(uname)` per row of an existing CTE or
    * table `srcCte` with columns `(uid, uname)`. Appends CTEs
    * `u5_msg .. u5_out(uid, u5)`; join `u5_out` on `uid`.
    *
    * The SHA-1 core is a single recursive CTE over round index `s`:
    * each step advances the (a,b,c,d,e) lanes; at s%80 = 79 the lanes
    * fold into (h0..h4) and re-seed the next block. The message
    * schedule rides along as `wl`, a 16-long window of prior W words
    * (W[t] for t≥16 = rotl1 of the xor of lags 3/8/14/16).
    */
  def uuid5Ctes(srcCte: String): String = {
    val wNew = rotl1("xor(xor(r.wl[14], r.wl[9]), xor(r.wl[3], r.wl[1]))")
    val w = s"(CASE WHEN r.s%80 < 16 THEN wt.w ELSE $wNew END)"
    val f =
      """(CASE WHEN r.s%80 < 20 THEN (r.b & r.c) | (xor(r.b, 4294967295) & r.d)
        |      WHEN r.s%80 < 40 THEN xor(xor(r.b, r.c), r.d)
        |      WHEN r.s%80 < 60 THEN (r.b & r.c) | (r.b & r.d) | (r.c & r.d)
        |      ELSE xor(xor(r.b, r.c), r.d) END)""".stripMargin.replace("\n", " ")
    val k =
      """(CASE WHEN r.s%80 < 20 THEN 1518500249 WHEN r.s%80 < 40 THEN 1859775393
        |      WHEN r.s%80 < 60 THEN 2400959708 ELSE 3395469782 END)"""
        .stripMargin.replace("\n", " ")
    val tmp = s"((${rotl5("r.a")} + $f + r.e + $k + $w) & 4294967295)"
    val nh0 = s"((r.h0 + $tmp) & 4294967295)"
    val nh1 = "((r.h1 + r.a) & 4294967295)"
    val nh2 = s"((r.h2 + ${rotl30("r.b")}) & 4294967295)"
    val nh3 = "((r.h3 + r.c) & 4294967295)"
    val nh4 = "((r.h4 + r.d) & 4294967295)"
    val last = "r.s%80 = 79"
    val iv = Seq("1732584193", "4023233417", "2562383102", "271733878", "3285377520")
      .map(v => s"CAST($v AS BIGINT)").mkString(", ")
    val hexOut = Seq("h0", "h1", "h2", "h3", "h4")
      .map(h => s"lpad(to_hex(f.$h),8,'0')").mkString(" || ")
    s"""u5_msg AS (
       |  SELECT uid, '$NsHex' || upper(hex(encode(uname))) AS mh FROM $srcCte),
       |u5_pad AS MATERIALIZED (
       |  SELECT uid, mh || '80' || repeat('0', (112 - (length(mh)+2) % 128 + 128) % 128) ||
       |    lpad(upper(to_hex(length(mh)*4)), 16, '0') AS ph
       |  FROM u5_msg),
       |u5_blocks AS MATERIALIZED (SELECT uid, ph, CAST(length(ph)/128 AS BIGINT) AS nblk FROM u5_pad),
       |u5_words AS MATERIALIZED (
       |  SELECT b.uid, gb.blk, gt.t, ${hexWord("b.ph", "gb.blk*128 + gt.t*8 + 1")} AS w
       |  FROM u5_blocks b
       |  CROSS JOIN generate_series(0, 15) gb(blk)
       |  CROSS JOIN generate_series(0, 15) gt(t)
       |  WHERE gb.blk < b.nblk),
       |u5_rounds(uid, s, a, b, c, d, e, h0, h1, h2, h3, h4, wl) AS (
       |  SELECT uid, CAST(0 AS BIGINT), $iv, $iv,
       |         CAST([0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0] AS BIGINT[])
       |  FROM u5_blocks
       |  UNION ALL
       |  SELECT r.uid, r.s + 1,
       |    CASE WHEN $last THEN $nh0 ELSE $tmp END,
       |    CASE WHEN $last THEN $nh1 ELSE r.a END,
       |    CASE WHEN $last THEN $nh2 ELSE ${rotl30("r.b")} END,
       |    CASE WHEN $last THEN $nh3 ELSE r.c END,
       |    CASE WHEN $last THEN $nh4 ELSE r.d END,
       |    CASE WHEN $last THEN $nh0 ELSE r.h0 END,
       |    CASE WHEN $last THEN $nh1 ELSE r.h1 END,
       |    CASE WHEN $last THEN $nh2 ELSE r.h2 END,
       |    CASE WHEN $last THEN $nh3 ELSE r.h3 END,
       |    CASE WHEN $last THEN $nh4 ELSE r.h4 END,
       |    r.wl[2:16] || [$w]
       |  FROM u5_rounds r
       |  JOIN u5_blocks bl ON bl.uid = r.uid
       |  LEFT JOIN u5_words wt ON wt.uid = r.uid AND wt.blk = r.s//80 AND wt.t = r.s%80
       |  WHERE r.s < bl.nblk*80),
       |u5_digest AS (
       |  SELECT f.uid, lower($hexOut) AS digest
       |  FROM u5_rounds f JOIN u5_blocks bl ON bl.uid = f.uid
       |  WHERE f.s = bl.nblk*80),
       |u5_out AS (
       |  SELECT uid,
       |    substr(digest,1,8) || '-' || substr(digest,9,4) || '-5' || substr(digest,14,3) ||
       |    '-' || substr('89ab',
       |      ((strpos('0123456789abcdef', substr(digest,17,1)) - 1) % 4) + 1, 1) ||
       |    substr(digest,18,3) || '-' || substr(digest,21,12) AS u5
       |  FROM u5_digest)""".stripMargin
  }

  /** CTE chain computing difflib `ratio` per row of an existing CTE
    * `ro_pairs(pid, a, b)`. Appends `ro_cand`, `ro_segs`,
    * `ro_ratio(pid, ratio)`.
    *
    * `ro_cand` enumerates every common-substring triple (i, j, k) per
    * pair once (names are short, so the cube is small); `ro_segs` is
    * the difflib recursion — pick the longest block in the segment
    * (ties: smallest i, then smallest j — difflib's scan order), then
    * recurse left and right of it. The matched length rides only on
    * the left child so SUM(got) = M, and ratio = 2M / (|a|+|b|).
    */
  def roRatioCtes: String =
    """ro_cand AS (
      |  SELECT p.pid, u1.i, u2.j, u3.k
      |  FROM ro_pairs p,
      |       unnest(generate_series(1, length(p.a))) u1(i),
      |       unnest(generate_series(1, length(p.b))) u2(j),
      |       unnest(generate_series(1, least(length(p.a), length(p.b)))) u3(k)
      |  WHERE u3.k <= length(p.a) - u1.i + 1
      |    AND u3.k <= length(p.b) - u2.j + 1
      |    AND substr(p.a, u1.i, u3.k) = substr(p.b, u2.j, u3.k)),
      |ro_segs(pid, alo, ahi, blo, bhi, got) AS (
      |  SELECT pid, 1, length(a) + 1, 1, length(b) + 1, 0 FROM ro_pairs
      |  UNION ALL
      |  SELECT s.pid,
      |    CASE w.which WHEN 0 THEN s.alo ELSE m.bst.i + m.bst.k END,
      |    CASE w.which WHEN 0 THEN m.bst.i ELSE s.ahi END,
      |    CASE w.which WHEN 0 THEN s.blo ELSE m.bst.j + m.bst.k END,
      |    CASE w.which WHEN 0 THEN m.bst.j ELSE s.bhi END,
      |    CASE w.which WHEN 0 THEN m.bst.k ELSE 0 END
      |  FROM ro_segs s
      |  CROSS JOIN (SELECT unnest([0,1]) AS which) w
      |  CROSS JOIN LATERAL (
      |    SELECT (SELECT {'i': c.i, 'j': c.j, 'k': c.k}
      |            FROM ro_cand c
      |            WHERE c.pid = s.pid
      |              AND c.i >= s.alo AND c.i + c.k <= s.ahi
      |              AND c.j >= s.blo AND c.j + c.k <= s.bhi
      |            ORDER BY c.k DESC, c.i, c.j LIMIT 1) AS bst) m
      |  WHERE s.alo < s.ahi AND s.blo < s.bhi AND m.bst.k IS NOT NULL),
      |ro_ratio AS MATERIALIZED (
      |  SELECT s.pid, 2.0 * sum(s.got) / (length(p.a) + length(p.b)) AS ratio
      |  FROM ro_segs s JOIN ro_pairs p ON p.pid = s.pid
      |  GROUP BY s.pid, p.a, p.b)""".stripMargin

  /** Full `FuzzyDedup.canonicalMap` replay (default blocked path) over
    * `namesSql` (one column `name`): multi-key blocking on first/last
    * token with trailing 's' stripped, merge when R-O ratio >
    * `ratioThreshold` OR same-length token lists differ only by plural
    * pairs costing < 0.2, connected components via transitive closure,
    * canonical = MIN name. Appends CTEs ending `fz_canon(name,
    * canonical)`; singletons map to themselves.
    */
  def fuzzyCanonCtes(namesSql: String, ratioThreshold: Double = 0.95): String =
    s"""fz_names AS (SELECT DISTINCT name FROM ($namesSql)),
       |fz_keys AS MATERIALIZED (
       |  SELECT DISTINCT name, u.bi AS block_i,
       |    CASE u.bi WHEN 0 THEN regexp_replace(string_split(name, ' ')[1], 's$$', '')
       |              ELSE regexp_replace(string_split(name, ' ')[-1], 's$$', '') END AS block
       |  FROM fz_names, unnest([0, 1]) u(bi)),
       |ro_pairs AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY a, b) AS pid, a, b
       |  FROM (SELECT DISTINCT ka.name AS a, kb.name AS b
       |        FROM fz_keys ka JOIN fz_keys kb
       |          ON ka.block_i = kb.block_i AND ka.block = kb.block
       |        WHERE ka.name < kb.name)),
       |$roRatioCtes,
       |fz_tok AS (
       |  SELECT pid, string_split(a, ' ') AS ta, string_split(b, ' ') AS tb FROM ro_pairs),
       |fz_cost AS MATERIALIZED (
       |  SELECT t.pid,
       |    sum(CASE WHEN t.ta[u.i] = t.tb[u.i] THEN 0.0
       |             WHEN t.ta[u.i] || 's' = t.tb[u.i]
       |               OR t.tb[u.i] || 's' = t.ta[u.i] THEN 0.1
       |             ELSE 1.0 END) AS cost
       |  FROM fz_tok t, unnest(generate_series(1, len(t.ta))) u(i)
       |  WHERE len(t.ta) = len(t.tb)
       |  GROUP BY t.pid),
       |fz_sym AS MATERIALIZED (
       |  SELECT p.a, p.b FROM ro_pairs p
       |  JOIN ro_ratio r ON r.pid = p.pid
       |  LEFT JOIN fz_cost c ON c.pid = p.pid
       |  WHERE r.ratio > $ratioThreshold OR coalesce(c.cost, 1e18) < 0.2
       |  UNION
       |  SELECT p.b, p.a FROM ro_pairs p
       |  JOIN ro_ratio r ON r.pid = p.pid
       |  LEFT JOIN fz_cost c ON c.pid = p.pid
       |  WHERE r.ratio > $ratioThreshold OR coalesce(c.cost, 1e18) < 0.2),
       |fz_reach(id, r) AS (
       |  SELECT name, name FROM fz_names
       |  UNION
       |  SELECT e.b, fz_reach.r FROM fz_reach JOIN fz_sym e ON e.a = fz_reach.id),
       |fz_canon AS MATERIALIZED (SELECT id AS name, MIN(r) AS canonical FROM fz_reach GROUP BY id)"""
      .stripMargin
}
