package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate documents per source in
  * deterministic (doc_id) order and chunk the token stream into fixed
  * `seqLen` training sequences ("concat-and-chunk" — the standard packing
  * used by GPT-style pretraining pipelines). Each document is assigned the
  * sequence in which its first token lands: seq_id = floor(offset / seqLen)
  * with offset = exclusive prefix sum of n_tok in doc_id order.
  *
  * Scale notes (100 TB): the naive formulation is a single window
  * `SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id)` — which puts an
  * ENTIRE source in one task, a guaranteed straggler when one crawl
  * dominates the mix. This implementation computes the same prefix sum as a
  * two-level distributed scan instead: doc_id-range buckets bound every
  * window partition to ≤ `bucketWidth` rows (level 1), and only the tiny
  * per-bucket totals flow through the per-source ordered window (level 2).
  * At 10^12 docs and bucketWidth = 1M, level 2 sees 10^6 rows per source —
  * and the scheme recurses if that ever stops being small. Both levels are
  * shuffle-on-key plans; associativity of + makes the result identical to
  * the single-window oracle.
  */
object Packing {

  /** Per-document sequence assignment: (source, doc_id, n_tok, offset,
    * seq_id). `offset` is the document's first-token position in its
    * source's concatenated token stream.
    */
  def pack(docs: DataFrame, seqLen: Int, bucketWidth: Int = 4096): DataFrame = {
    require(seqLen > 0 && bucketWidth > 0)
    val base = docs.select(col("source"), col("doc_id"),
        col("n_tok").cast("long").as("n_tok"))
      // integral floor division (`div`, not `/`+floor: the double route
      // loses exactness past 2^53 — reachable by offsets at 10^12 docs);
      // monotone in doc_id, so bucket order == doc order
      .withColumn("__b", expr(s"doc_id div ${bucketWidth}L"))
    // level 1: exclusive prefix sum WITHIN each (source, bucket) — bounded
    // partitions (≤ bucketWidth docs; ids are unique integers)
    val wIn = Window.partitionBy(col("source"), col("__b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inOff = base.withColumn("__in_off", coalesce(sum(col("n_tok")).over(wIn), lit(0L)))
    // level 2: exclusive prefix sum of bucket TOTALS per source — input is
    // the bucket-summary table, |docs| / bucketWidth rows
    val wB = Window.partitionBy(col("source")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bOff = base.groupBy(col("source"), col("__b"))
      .agg(sum(col("n_tok")).as("__bt"))
      .withColumn("__b_off", coalesce(sum(col("__bt")).over(wB), lit(0L)))
      .select(col("source"), col("__b"), col("__b_off"))
    inOff.join(bOff, Seq("source", "__b"))
      .withColumn("offset", col("__b_off") + col("__in_off"))
      .withColumn("seq_id", expr(s"offset div ${seqLen}L"))
      .select(col("source"), col("doc_id"), col("n_tok"), col("offset"), col("seq_id"))
  }

  /** Packing manifest: one row per (source, seq_id) with the documents
    * STARTING in that sequence — what a loader needs to materialize
    * training batches without re-scanning the corpus.
    */
  def packSummary(docs: DataFrame, seqLen: Int, bucketWidth: Int = 4096): DataFrame =
    pack(docs, seqLen, bucketWidth)
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("toks_in"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
}
