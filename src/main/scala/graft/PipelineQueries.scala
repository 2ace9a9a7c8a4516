package graft

import graft.pipeline._
import graft.spark.Tokenize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline queries (dedup / similarity / text analysis /
  * multimodal) with DuckDB oracles where the semantics are SQL-expressible;
  * LSH-style probabilistic ops are rows-only here and are held to their
  * exact counterparts in PipelineSpec instead.
  */
object PipelineQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Token table with numeric doc ids so pair ordering (doc_a < doc_b)
    * matches the integer ordering DuckDB uses.
    */
  private def tokenDocs(spark: SparkSession, dir: String): DataFrame =
    Tokenize.documents(spark, dir)._1.toDF()
      .withColumn("doc_id", col("doc_id").cast("bigint"))

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  // --- dedup -----------------------------------------------------------

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(tokenDocs(spark, dir))
      .select(col("rep_doc_id").cast("bigint").as("rep_doc_id"), col("n_dups"))

  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(tokenDocs(spark, dir), n = 3, minInter = 3)
      .select(col("doc_a").cast("bigint").as("doc_a"),
        col("doc_b").cast("bigint").as("doc_b"),
        col("inter_cnt").cast("bigint").as("inter_cnt"),
        col("union_cnt").cast("bigint").as("union_cnt"))

  /** Document-frequency cap on (the 100-TB skew guard: a boilerplate gram
    * shared by f docs contributes f² join pairs; grams above the cap carry
    * no dedup signal and are dropped BEFORE the self-join, bounding every
    * posting list). Σf² is bounded by cap·Σf — linear in corpus size. The
    * cap is deterministic, so the DuckDB oracle reproduces it exactly:
    * inter_cnt counts surviving shared grams (a lower bound of the uncapped
    * count — PipelineSpec asserts the subset property), union_cnt keeps the
    * full |A|+|B|−inter accounting.
    */
  def ngramJaccardCapped(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(tokenDocs(spark, dir), n = 3, minInter = 3,
        maxPostings = Some(2))
      .select(col("doc_a").cast("bigint").as("doc_a"),
        col("doc_b").cast("bigint").as("doc_b"),
        col("inter_cnt").cast("bigint").as("inter_cnt"),
        col("union_cnt").cast("bigint").as("union_cnt"))

  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(tokenDocs(spark, dir), tau = 0.7)
      .select(col("doc_a").cast("bigint"), col("doc_b").cast("bigint"),
        col("inter_cnt"), col("union_cnt"))

  /** Near-dup CLUSTERS: the per-document canonical assignment derived from
    * the MinHash pair list via connected components — what a real dedup
    * pipeline keeps (one doc per cluster), not just the pairs. Exact
    * oracle: DuckDB recursive transitive closure over the same pair set.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
        Dedup.minhashLshPairs(tokenDocs(spark, dir), tau = 0.7)
          .select(col("doc_a"), col("doc_b")))
      .select(col("doc_id").cast("bigint").as("doc_id"),
        col("rep_id").cast("bigint").as("rep_id"))

  /** Benchmark decontamination: training docs sharing any 5-gram with the
    * (deterministic) benchmark subset doc_id % 29 == 0 — eval-overlap
    * removal with the benchmark gram set broadcast, so the corpus side
    * never shuffles.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val t = tokenDocs(spark, dir)
    Dedup.benchmarkOverlap(
        train = t.filter(col("doc_id") % 29 =!= 0),
        bench = t.filter(col("doc_id") % 29 === 0),
        n = 5, minShared = 1)
      .select(col("doc_id").cast("bigint").as("doc_id"), col("n_shared"))
  }

  /** Deterministic stratified mixture sampling: srcs 0–4 kept at 80%,
    * the rest at 30%, decided by splitmix64(doc_id) mod 100 — exactly
    * reproduced by the oracle's UBIGINT arithmetic.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratified(tokenDocs(spark, dir),
        ratesPct = (0 to 4).map(i => s"src$i" -> 80).toMap, defaultPct = 30)
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))

  /** C4-style duplicate-span removal at token granularity: every
    * non-overlapping 10-token block whose content occurred earlier in the
    * corpus (first-occurrence order = (doc_id, blk)) is flagged. The block
    * content itself is the shuffle key — exact by construction.
    */
  def spanDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.spanDuplicates(tokenDocs(spark, dir), k = 10)
      .select(col("doc_id"), col("blk"))

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(tokenDocs(spark, dir), maxHamming = 3)
      .select(col("doc_a").cast("bigint"), col("doc_b").cast("bigint"), col("hamming"))

  def embeddingNearDups(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDups(emb(spark, dir), tau = 0.5)
      .select(col("vec_a"), col("vec_b"))

  // --- similarity search ------------------------------------------------

  def annBruteForce(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(emb(spark, dir), queryId = 0L, k = 10)
      .select(col("vec_id"))

  def annLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(emb(spark, dir), queryId = 0L, k = 10)
      .select(col("vec_id"))

  /** Shipped IVF query uses the seeded sign-vector quantizer — exactly
    * SQL-reproducible (OracleSql.ivfSignSql); the KMeans quantizer variant
    * (Similarity.ivfTopK) is held to a recall floor in PipelineSpec instead.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfSignTopK(emb(spark, dir), queryId = 0L, k = 10)
      .select(col("vec_id"))

  /** IVF against the CELL-PARTITIONED on-disk index (the 100-TB layout):
    * index written partitionBy(__cell), probe cells computed driver-side,
    * scan prunes to nprobe/nlist of the files (PartitionFilters asserted in
    * PipelineSpec). Same quantizer as q_ann_ivf → same exact oracle.
    */
  def annIvfIndexed(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val path = s"/tmp/graft_ivf_index_${Integer.toHexString(dir.hashCode)}"
    // rewrite each run: cheap at verify scale and keeps the entry
    // self-contained; at 100 TB the index is written once and reused
    Similarity.ivfSignIndexWrite(e, path, nlist = 16, seed = 13L)
    val qEmb = e.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    Similarity.ivfSignIndexQuery(spark, path, qEmb, k = 10,
        nlist = 16, nprobe = 4, seed = 13L, excludeVecId = 0L)
      .select(col("vec_id"))
  }

  /** IVF-SQ8 — the production ANN layout at 100 TB: the cell-partitioned
    * on-disk index (file-listing-time pruning via PartitionFilters, like
    * q_ann_ivf_indexed) storing INT8 CODES instead of float32, so the
    * probed scan also moves 4× fewer bytes and scores with integer dots.
    * The oracle covers cell assignment + probe selection + the quantized
    * ranking, emitting the exact integer dot/norm triple.
    */
  def annIvfSq8(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val path = s"/tmp/graft_ivf_sq8_${Integer.toHexString(dir.hashCode)}"
    Quantize.ivfSq8IndexWrite(e, path, nlist = 16, seed = 13L)
    val qEmb = e.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    Quantize.ivfSq8Query(spark, path, qEmb, k = 10,
      nlist = 16, nprobe = 4, seed = 13L, excludeVecId = 0L)
  }

  /** Embedding-column COMPRESSION: symmetric per-vector int8 scalar
    * quantization (pipeline.Quantize) — 1 B/dim codes + an 8 B scale vs
    * float32's 4 B/dim. Emits per-vector code stats (exact integers) and the
    * reconstruction-bound attestation |x − q·scale| ≤ scale/2; the oracle
    * recomputes the codes from the same floats in DuckDB, so the quantizer
    * is hash-checked value by value.
    */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame =
    Quantize.quantizeStats(emb(spark, dir))

  /** ANN top-k scored ENTIRELY in the quantized domain: integer dot
    * products over 1-byte codes (cosine is scale-invariant, so no
    * dequantize anywhere) — the 4× memory-traffic cut that bounds
    * brute-force scoring at scale. Output carries the exact integer
    * dot/norm triple, so the oracle match is bit-exact, not
    * tolerance-based.
    */
  def annQuantized(spark: SparkSession, dir: String): DataFrame =
    Quantize.bruteForceTopKQuantized(emb(spark, dir), queryId = 0L, k = 10)

  // --- text analysis -----------------------------------------------------

  def qualityScores(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(docs(spark, dir))

  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(docs(spark, dir))

  def langIdPred(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(TextAnalysis.langId(col("text")).as("pred"))
      .groupBy(col("pred")).agg(count(lit(1)).as("n"))

  /** Gopher-style within-doc repetition signal: duplicate-3-gram ratio per
    * document, flag at 5% — one scan pass, no shuffle.
    */
  def repetitionScores(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionScores(tokenDocs(spark, dir))
      .select(col("doc_id").cast("bigint").as("doc_id"),
        col("total_grams"), col("distinct_grams"), col("dup_ratio"), col("repetitive"))

  /** Concat-and-chunk sequence packing into 1024-token training sequences:
    * per-(source, seq_id) manifest rows. The two-level distributed prefix
    * sum (Packing.pack) is exactly the single window cumsum the oracle
    * runs, by associativity.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame =
    Packing.packSummary(tokenDocs(spark, dir), seqLen = 1024, bucketWidth = 64)
      .select(col("source"), col("seq_id"), col("n_docs"), col("toks_in"),
        col("first_doc"), col("last_doc"))

  /** Exact corpus-vocabulary heavy hitters (top 100 tokens). */
  def vocabTopK(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabTopK(tokenDocs(spark, dir), k = 100)
      .select(col("tok").cast("bigint").as("tok"), col("n"))

  /** Exact per-source length percentiles via the histogram inverse CDF. */
  def lengthPercentiles(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.lengthPercentiles(tokenDocs(spark, dir), ks = Seq(50, 90, 99))

  def fingerprintPairs(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprintPairs(tokenDocs(spark, dir))
      .select(col("doc_a").cast("bigint"), col("doc_b").cast("bigint"), col("shared"))

  // --- multimodal ---------------------------------------------------------

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.fromDocuments(spark, dir)
    Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("byte_len").cast("bigint").as("byte_len"),
        col("width").cast("bigint").as("width"), col("height").cast("bigint").as("height"),
        col("n_frames").cast("bigint").as("n_frames"))
  }

  // --- wiring ------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (dedupExact _),
    "q_ngram_jaccard" -> (ngramJaccard _),
    "q_ngram_jaccard_capped" -> (ngramJaccardCapped _),
    "q_dedup_minhash" -> (dedupMinhash _),
    "q_dedup_clusters" -> (dedupClusters _),
    "q_decontaminate" -> (decontaminate _),
    "q_stratified_sample" -> (stratifiedSample _),
    "q_span_dedup" -> (spanDedup _),
    "q_dedup_simhash" -> (dedupSimhash _),
    "q_embedding_near_dups" -> (embeddingNearDups _),
    "q_ann_brute_force" -> (annBruteForce _),
    "q_embed_quantize" -> (embedQuantize _),
    "q_ann_quantized" -> (annQuantized _),
    "q_ann_ivf_sq8" -> (annIvfSq8 _),
    "q_ann_lsh" -> (annLsh _),
    "q_ann_ivf" -> (annIvf _),
    "q_ann_ivf_indexed" -> (annIvfIndexed _),
    "q_quality_scores" -> (qualityScores _),
    "q_repetition_scores" -> (repetitionScores _),
    "q_pack_sequences" -> (packSequences _),
    "q_vocab_topk" -> (vocabTopK _),
    "q_length_percentiles" -> (lengthPercentiles _),
    "q_token_counts" -> (tokenCounts _),
    "q_lang_id" -> (langIdPred _),
    "q_fingerprint_pairs" -> (fingerprintPairs _),
    "q_multimodal_meta" -> (multimodalMeta _)
  )

  private val wordsSql = """regexp_split_to_array(trim(text), '\s+')"""
  private val ntokSql = s"len(list_filter($wordsSql, x -> x <> ''))"

  val oracles: Map[String, String] = Map(
    // Concat-and-chunk packing: the oracle runs the NAIVE single-window
    // prefix sum; the Spark side's two-level distributed scan must agree
    // exactly (associativity of +) or this row goes red.
    "q_pack_sequences" ->
      s"""WITH w AS (
         |  SELECT source, doc_id, CAST($ntokSql AS BIGINT) AS n_tok FROM documents
         |), o AS (
         |  SELECT source, doc_id, n_tok,
         |    COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM w
         |)
         |SELECT source, CAST(off // 1024 AS BIGINT) AS seq_id, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS toks_in,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM o GROUP BY 1, 2""".stripMargin,
    "q_vocab_topk" -> OracleSql.vocabTopKSql(k = 100),
    // Inverse-CDF percentiles over the length histogram; ceil(t·k/100) as
    // (t*k + 99) // 100 keeps both engines in integer arithmetic.
    "q_length_percentiles" ->
      s"""WITH w AS (
         |  SELECT source, CAST($ntokSql AS BIGINT) AS n_tok FROM documents
         |), h AS (
         |  SELECT source, n_tok, count(*) AS c FROM w GROUP BY 1, 2
         |), cum AS (
         |  SELECT source, n_tok,
         |    SUM(c) OVER (PARTITION BY source ORDER BY n_tok) AS cum,
         |    SUM(c) OVER (PARTITION BY source) AS tot
         |  FROM h
         |)
         |SELECT source,
         |  CAST(min(CASE WHEN cum >= (tot * 50 + 99) // 100 THEN n_tok END) AS BIGINT) AS p50,
         |  CAST(min(CASE WHEN cum >= (tot * 90 + 99) // 100 THEN n_tok END) AS BIGINT) AS p90,
         |  CAST(min(CASE WHEN cum >= (tot * 99 + 99) // 100 THEN n_tok END) AS BIGINT) AS p99
         |FROM cum GROUP BY source""".stripMargin,
    "q_dedup_exact" ->
      "SELECT min(doc_id) AS rep_doc_id, count(*) AS n_dups FROM documents GROUP BY text",
    // Duplicate k-token spans, global first-occurrence kept: the oracle
    // rebuilds the same non-overlapping 10-word blocks from text (the
    // token↔word bijection makes block equality identical across domains)
    // and flags every occurrence after the (doc_id, blk)-first one.
    "q_span_dedup" ->
      s"""WITH __sw AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, $wordsSql AS words FROM documents
         |), __si AS (
         |  SELECT doc_id, words, unnest(range(len(words) // 10)) AS i FROM __sw
         |), __sb AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS blk,
         |         array_to_string(words[(i*10+1):(i*10+10)], ' ') AS content
         |  FROM __si
         |), __sd AS (
         |  SELECT doc_id, blk,
         |         row_number() OVER (PARTITION BY content ORDER BY doc_id, blk) AS rn
         |  FROM __sb
         |)
         |SELECT doc_id, blk FROM __sd WHERE rn > 1""".stripMargin,
    "q_ngram_jaccard" ->
      s"""WITH w AS (
         |  SELECT doc_id, source, $wordsSql AS ws FROM documents
         |), g AS (
         |  SELECT doc_id, source,
         |    list_distinct(list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS grams
         |  FROM w WHERE len(ws) >= 3
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  len(list_intersect(a.grams, b.grams)) AS inter_cnt,
         |  len(list_distinct(list_concat(a.grams, b.grams))) AS union_cnt
         |FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.grams, b.grams)) >= 3""".stripMargin,
    // Same inverted-index semantics with the deterministic df-cap applied
    // before the pair join (q_ngram_jaccard_capped mirrors
    // Dedup.ngramJaccardPairs(maxPostings=Some(2)) exactly: n_grams taken
    // from the FULL distinct gram set, the cap only filters postings).
    // cap=2 is deliberately tight so the drop path executes at the sf0.01
    // verify scale (max gram df there is 3); production caps are O(1000).
    "q_ngram_jaccard_capped" ->
      s"""WITH w AS (
         |  SELECT doc_id, source, $wordsSql AS ws FROM documents
         |), g AS (
         |  SELECT doc_id, source,
         |    list_distinct(list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS grams
         |  FROM w WHERE len(ws) >= 3
         |), e AS (
         |  SELECT doc_id, source, len(grams) AS n, unnest(grams) AS gram FROM g
         |), keep AS (
         |  SELECT source, gram FROM e GROUP BY 1, 2 HAVING count(*) <= 2
         |), ek AS (
         |  SELECT e.* FROM e JOIN keep USING (source, gram)
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  count(*) AS inter_cnt,
         |  a.n + b.n - count(*) AS union_cnt
         |FROM ek a JOIN ek b
         |  ON a.gram = b.gram AND a.source = b.source AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id, a.n, b.n
         |HAVING count(*) >= 3""".stripMargin,
    // Exact SQL reproduction of the LSH pipeline's OUTPUT on this corpus:
    // the seeded MinHash/LSH has full recall at tau=0.7 here (asserted in
    // PipelineSpec), and every candidate is exact-Jaccard-confirmed, so the
    // result set equals the unblocked exact-Jaccard pairs.
    "q_dedup_minhash" ->
      s"""WITH w AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents
         |), g AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS grams
         |  FROM w WHERE len(ws) >= 3
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  len(list_intersect(a.grams, b.grams)) AS inter_cnt,
         |  len(list_distinct(list_concat(a.grams, b.grams))) AS union_cnt
         |FROM g a JOIN g b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.grams, b.grams))
         |      >= 0.7 * len(list_distinct(list_concat(a.grams, b.grams)))""".stripMargin,
    // Clusters = recursive transitive closure over the SAME pair set as
    // q_dedup_minhash (full recall at tau=0.7 on this corpus, see above),
    // min reachable doc_id as the canonical representative.
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE w AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents
         |), g AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS grams
         |  FROM w WHERE len(ws) >= 3
         |), pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM g a JOIN g b ON a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.grams, b.grams))
         |        >= 0.7 * len(list_distinct(list_concat(a.grams, b.grams)))
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |), reach(src, dst) AS (
         |  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
         |)
         |SELECT src AS doc_id, min(dst) AS rep_id FROM reach GROUP BY src""".stripMargin,
    // Benchmark decontamination: 5-gram overlap with the deterministic
    // benchmark subset doc_id % 29 == 0, gram identity via word strings
    // (the Spark side joins 64-bit shingle hashes — a collision would
    // surface here as a row diff, not hide).
    "q_decontaminate" ->
      s"""WITH w AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents
         |), g AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(ws) - 3),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS grams
         |  FROM w WHERE len(ws) >= 5
         |), bg AS (
         |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 29 = 0
         |), tg AS (
         |  SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 29 <> 0
         |)
         |SELECT doc_id, count(*) AS n_shared FROM tg JOIN bg USING (gram)
         |GROUP BY doc_id HAVING count(*) >= 1""".stripMargin,
    "q_stratified_sample" ->
      OracleSql.stratifiedSampleSql((0 to 4).map(i => s"src$i"), 80, 30),
    // LSH-blocked near-dups: the oracle recomputes the same seed-derived
    // hyperplane buckets (OracleSql embeds the sign masks) and confirms by
    // exact cosine — checking candidate generation AND confirmation.
    "q_embedding_near_dups" ->
      OracleSql.embeddingNearDupsSql(tau = 0.5, nBits = 8, nTables = 12, seed = 3L),
    "q_ann_lsh" ->
      OracleSql.annLshSql(queryId = 0L, k = 10, nBits = 4, nTables = 8, seed = 7L),
    "q_ann_ivf" ->
      OracleSql.ivfSignSql(queryId = 0L, k = 10, nlist = 16, nprobe = 4, seed = 13L),
    // identical semantics through the cell-partitioned on-disk index
    "q_ann_ivf_indexed" ->
      OracleSql.ivfSignSql(queryId = 0L, k = 10, nlist = 16, nprobe = 4, seed = 13L),
    "q_ann_ivf_sq8" ->
      OracleSql.ivfSq8Sql(queryId = 0L, k = 10, nlist = 16, nprobe = 4, seed = 13L),
    "q_dedup_simhash" -> OracleSql.simhashSql(maxHamming = 3),
    "q_fingerprint_pairs" -> OracleSql.fingerprintSql(k = 5, w = 4, minShared = 2),
    "q_lang_id" -> OracleSql.langIdSql(),
    "q_ann_brute_force" ->
      """SELECT b.vec_id FROM embeddings a, embeddings b
        | WHERE a.vec_id = 0 AND b.vec_id <> 0
        | ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id
        | LIMIT 10""".stripMargin,
    // int8 scalar quantization: the oracle recomputes the exact codes from
    // the same floats — round-half-away-from-zero spelled as the floor form
    // on BOTH sides so no engine rounding rule is in play; all outputs are
    // integers except the recon bound, whose double-op sequence is identical
    // on both sides.
    "q_embed_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127 AS sc
        |  FROM embeddings
        |), c AS (
        |  SELECT vec_id, sc, embedding,
        |    list_transform(embedding, x ->
        |      CASE WHEN sc = 0 THEN 0
        |           WHEN CAST(x AS DOUBLE) >= 0 THEN CAST(floor(CAST(x AS DOUBLE)/sc + 0.5) AS BIGINT)
        |           ELSE -CAST(floor(-CAST(x AS DOUBLE)/sc + 0.5) AS BIGINT) END) AS q
        |  FROM s
        |)
        |SELECT vec_id,
        |  CAST(len(q) AS BIGINT) AS n_bytes,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  CAST(list_min(q) AS BIGINT) AS q_min,
        |  CAST(list_max(q) AS BIGINT) AS q_max,
        |  len(list_filter(embedding, x -> NOT (abs(CAST(x AS DOUBLE) -
        |      (CASE WHEN sc = 0 THEN 0
        |            WHEN CAST(x AS DOUBLE) >= 0 THEN floor(CAST(x AS DOUBLE)/sc + 0.5)
        |            ELSE -floor(-CAST(x AS DOUBLE)/sc + 0.5) END) * sc)
        |      <= sc * 0.5 + 1e-12))) = 0 AS recon_ok
        |FROM c""".stripMargin,
    // quantized-domain ANN: ordering key = dot/sqrt(norm_a·norm_b) computed
    // from EXACT integer dots (codes are small ints, inner products ≤ 64·127²
    // — exact in double), so the ranking is engine-independent; the emitted
    // columns are the integer triple itself.
    "q_ann_quantized" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127 AS sc
        |  FROM embeddings
        |), qt AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x ->
        |      CASE WHEN sc = 0 THEN CAST(0 AS DOUBLE)
        |           WHEN CAST(x AS DOUBLE) >= 0 THEN floor(CAST(x AS DOUBLE)/sc + 0.5)
        |           ELSE -floor(-CAST(x AS DOUBLE)/sc + 0.5) END) AS q
        |  FROM s
        |), a AS (SELECT q AS qa FROM qt WHERE vec_id = 0)
        |SELECT b.vec_id,
        |  CAST(list_inner_product(qa, b.q) AS BIGINT) AS dot_qq,
        |  CAST(list_inner_product(qa, qa) AS BIGINT) AS norm_a,
        |  CAST(list_inner_product(b.q, b.q) AS BIGINT) AS norm_b
        |FROM qt b, a
        |WHERE b.vec_id <> 0
        |ORDER BY list_inner_product(qa, b.q)
        |           / sqrt(list_inner_product(qa, qa) * list_inner_product(b.q, b.q)) DESC,
        |         b.vec_id
        |LIMIT 10""".stripMargin,
    "q_quality_scores" ->
      s"""SELECT doc_id,
         |  len($wordsSql) AS n_words,
         |  len(list_filter($wordsSql, w -> w IN ('the', 'a'))) AS stop_cnt,
         |  length(trim(text)) AS n_chars,
         |  (len($wordsSql) >= 10 AND len($wordsSql) <= 5000
         |   AND len(list_filter($wordsSql, w -> w IN ('the', 'a'))) * 2 <= len($wordsSql)) AS quality_ok
         |FROM documents""".stripMargin,
    "q_repetition_scores" ->
      s"""WITH w AS (
         |  SELECT doc_id, $wordsSql AS ws FROM documents
         |), g AS (
         |  SELECT doc_id, len(ws) - 2 AS total_grams,
         |    len(list_distinct(list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS distinct_grams
         |  FROM w WHERE len(ws) >= 3
         |)
         |SELECT doc_id, total_grams, distinct_grams,
         |  1 - CAST(distinct_grams AS DOUBLE) / total_grams AS dup_ratio,
         |  (1 - CAST(distinct_grams AS DOUBLE) / total_grams) > 0.05 AS repetitive
         |FROM g""".stripMargin,
    "q_token_counts" ->
      s"""SELECT doc_id, len($wordsSql) AS ws_tokens,
         |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS bpeish_tokens
         |FROM documents""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  octet_length(CAST(text AS BLOB)) AS byte_len,
        |  CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 64 + ascii(text) % 64 END AS width,
        |  CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 64 + ascii(substr(text, 2, 1)) % 64 END AS height,
        |  CASE WHEN doc_id % 3 = 0 THEN 1
        |       WHEN doc_id % 3 = 1 THEN 1 + octet_length(CAST(text AS BLOB)) % 100
        |       ELSE 1 + octet_length(CAST(text AS BLOB)) % 30 END AS n_frames
        |FROM documents""".stripMargin
  )
}
