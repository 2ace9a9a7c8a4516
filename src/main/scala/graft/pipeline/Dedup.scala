package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication suite over the token table (doc_id, tokens, n_tok, source).
  *
  * Scale notes (100 TB): every method is a shuffle-on-key plan — no
  * all-pairs comparison ever happens outside candidate buckets. Exact dedup
  * groups by the token array; MinHash/SimHash explode to (band, signature)
  * keys whose group sizes are the only quadratic surface (bounded by
  * near-dup cluster sizes, and salt-able if a degenerate key appears).
  */
object Dedup {
  import PipelineFunctions._

  /** Exact duplicates: group by token content, keep the min doc_id as the
    * canonical representative.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(col("tokens"))
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_dups"))
      .select(col("rep_doc_id"), col("n_dups"))

  /** Exact n-gram Jaccard pairs above an intersection floor, blocked by a
    * join key (the SQL-checkable baseline; LSH below is the scale path).
    * Returns (doc_a, doc_b, inter_cnt, union_cnt).
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minInter: Int,
                        blockKey: String = "source"): DataFrame = {
    val g = docs.filter(col("n_tok") >= n)
      .select(col("doc_id"), col(blockKey).as("__bk"),
        shingleHashes(col("tokens"), n).as("grams"))
    val a = g.alias("a")
    val b = g.alias("b")
    a.join(b, col("a.__bk") === col("b.__bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.grams"), col("b.grams"))).as("inter_cnt"),
        size(array_union(col("a.grams"), col("b.grams"))).as("union_cnt"))
      .filter(col("inter_cnt") >= minInter)
  }

  /** MinHash + LSH near-duplicate pairs: shingle → k-hash signature → b
    * bands of r rows → bucket-join on (band, band-signature) → exact-Jaccard
    * confirmation on candidates only. The canonical web-dedup plan: the only
    * join is on band buckets, so cost scales with true-duplicate density.
    */
  def minhashLshPairs(docs: DataFrame, shingleN: Int = 3, numHashes: Int = 64,
                      bands: Int = 16, tau: Double = 0.7, seed: Long = 42L): DataFrame = {
    val r = numHashes / bands
    val g = docs.filter(col("n_tok") >= shingleN)
      .select(col("doc_id"),
        shingleHashes(col("tokens"), shingleN).as("grams"))
      .withColumn("sig", minhashSig(col("grams"), numHashes, seed))
    val banded = g.select(col("doc_id"), col("grams"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * r + 1, lit(r)), b))).as(Seq("band", "bh")))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val cands = a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.grams").as("ga"), col("b.grams").as("gb"))
      .dropDuplicates("doc_a", "doc_b")
    cands
      .withColumn("inter_cnt", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("union_cnt", size(array_union(col("ga"), col("gb"))))
      .filter(col("inter_cnt") >= col("union_cnt") * tau)
      .select(col("doc_a"), col("doc_b"), col("inter_cnt"), col("union_cnt"))
  }

  /** SimHash near-duplicates: 64-bit signature, candidates via 4×16-bit band
    * buckets (any pair within Hamming distance ≤3 shares at least one intact
    * band by pigeonhole), confirmed by exact Hamming distance.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole covers Hamming distance <= 3")
    val g = docs.select(col("doc_id"), simhash64(col("tokens")).as("sig"))
    val bandCols = array((0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * 16).bitwiseAND(lit(0xffffL)).as("bh"))): _*)
    val banded = g.select(col("doc_id"), col("sig"), explode(bandCols).as("z"))
      .select(col("doc_id"), col("sig"), col("z.band").as("band"), col("z.bh").as("bh"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sa"), col("b.sig").as("sb"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Embedding cosine near-duplicates, exact within a blocking key (the
    * SQL-checkable baseline; Similarity.lshBuckets is the scale path).
    */
  def embeddingNearDups(emb: DataFrame, tau: Double): DataFrame = {
    val a = emb.alias("a")
    val b = emb.alias("b")
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", Similarity.cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("cos") >= tau)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
  }
}
