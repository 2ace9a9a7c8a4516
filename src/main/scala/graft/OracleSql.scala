package graft

import graft.pipeline.Hashing

/** DuckDB oracle-SQL generators for the hash-based pipeline queries.
  *
  * The dedup/fingerprint/LSH operators are seed-deterministic (splitmix64),
  * so their results are exactly reproducible by plain SQL: splitmix64 is
  * re-expressed over UBIGINT with HUGEINT-split multiplication (verified
  * against the Scala implementation on 2000 random inputs), and the LSH
  * hyperplane signs — pure constants of (seed, table, bit, dim) — are
  * precomputed HERE with the same `Hashing.mix64` the Catalyst expressions
  * use and embedded as literal bitmasks. The oracle therefore checks the
  * full pipeline (tokenize → hash → band → join → confirm) independently.
  */
object OracleSql {

  private val M64 = BigInt(1) << 64
  private val C1 = BigInt("9e3779b97f4a7c15", 16)
  private val C2 = BigInt("bf58476d1ce4e5b9", 16)
  private val C3 = BigInt("94d049bb133111eb", 16)
  private val FNV = BigInt("cbf29ce484222325", 16)

  /** (z * c) mod 2^64 over UBIGINT column `z`, via 32-bit split so every
    * intermediate fits HUGEINT: z*c ≡ zl*c + zh*((c<<32) mod 2^64).
    */
  private def mulmod(z: String, c: BigInt): String = {
    val c32 = (c << 32) mod M64
    s"CAST(((CAST($z % 4294967296 AS HUGEINT) * $c) % $M64 + " +
      s"(CAST($z // 4294967296 AS HUGEINT) * $c32) % $M64) % $M64 AS UBIGINT)"
  }

  /** Chained CTEs computing z = splitmix64(zCol), carrying `keep` columns.
    * MATERIALIZED stages bound expression-tree growth when chains compose.
    * Returns (cteText, lastCteName); the output column is `z`.
    */
  private def mix64Ctes(name: String, from: String, keep: Seq[String], zCol: String): (String, String) = {
    val k = if (keep.isEmpty) "" else keep.mkString("", ", ", ", ")
    val sql =
      s"""${name}_1 AS MATERIALIZED (SELECT ${k}CAST((CAST($zCol AS HUGEINT) + $C1) % $M64 AS UBIGINT) AS z FROM $from),
         |${name}_2 AS (SELECT ${k}xor(z, z >> 30) AS z FROM ${name}_1),
         |${name}_3 AS MATERIALIZED (SELECT $k${mulmod("z", C2)} AS z FROM ${name}_2),
         |${name}_4 AS (SELECT ${k}xor(z, z >> 27) AS z FROM ${name}_3),
         |${name}_5 AS MATERIALIZED (SELECT $k${mulmod("z", C3)} AS z FROM ${name}_4),
         |${name}_6 AS (SELECT ${k}xor(z, z >> 31) AS z FROM ${name}_5)""".stripMargin
    (sql, s"${name}_6")
  }

  /** Shared tokenization CTEs reproducing `Tokenize.documents`: non-empty
    * whitespace words, exact sorted-distinct vocabulary ids, 1-based
    * positions. Exposes __tok(doc_id, i, tok).
    */
  private val tokenizeCtes: String =
    """__w AS MATERIALIZED (
      |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
      |  FROM documents),
      |__vocab AS MATERIALIZED (
      |  SELECT w, row_number() OVER (ORDER BY w) - 1 AS id
      |  FROM (SELECT DISTINCT unnest(ws) AS w FROM __w)),
      |__tokw AS (SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws)+1)) AS i FROM __w),
      |__tok AS MATERIALIZED (
      |  SELECT t.doc_id, t.i, v.id AS tok FROM __tokw t JOIN __vocab v ON v.w = t.w)""".stripMargin

  /** Deterministic stratified sampling (Sampling.stratified semantics):
    * keep iff splitmix64(doc_id) mod 100 (unsigned, = DuckDB UBIGINT %)
    * is below the source's percentage; reports per-source kept counts.
    */
  def stratifiedSampleSql(highSources: Seq[String], highPct: Int,
                          defaultPct: Int): String = {
    val (ctes, last) = mix64Ctes("__sm", "documents", Seq("doc_id", "source"),
      "CAST(doc_id AS UBIGINT)")
    val inList = highSources.map(s => s"'$s'").mkString(", ")
    s"""WITH $ctes
       |SELECT source, count(*) AS n_kept FROM $last
       |WHERE z % 100 < (CASE WHEN source IN ($inList) THEN $highPct ELSE $defaultPct END)
       |GROUP BY source""".stripMargin
  }

  /** Late-materialized sampling (Queries.sampleDecodeEncoded semantics):
    * the same splitmix64 mixture-sampling predicate as stratifiedSampleSql,
    * but returning per-document token sums + counts — reproducing what the
    * Spark side decodes from the sampled rows of the COMPRESSED table.
    * Empty documents survive sampling with (0, 0).
    */
  def sampledDecodeSql(highSources: Seq[String], highPct: Int,
                       defaultPct: Int): String = {
    val (ctes, last) = mix64Ctes("__sm", "documents", Seq("doc_id", "source"),
      "CAST(doc_id AS UBIGINT)")
    val inList = highSources.map(s => s"'$s'").mkString(", ")
    s"""WITH $tokenizeCtes,
       |$ctes,
       |__keep AS (
       |  SELECT doc_id FROM $last
       |  WHERE z % 100 < (CASE WHEN source IN ($inList) THEN $highPct ELSE $defaultPct END)),
       |__sums AS (
       |  SELECT doc_id, CAST(sum(tok) AS BIGINT) AS tok_sum,
       |    CAST(count(*) AS BIGINT) AS n_tok
       |  FROM __tok GROUP BY doc_id)
       |SELECT CAST(k.doc_id AS BIGINT) AS doc_id,
       |  COALESCE(s.tok_sum, 0) AS tok_sum, COALESCE(s.n_tok, 0) AS n_tok
       |FROM __keep k LEFT JOIN __sums s USING (doc_id)""".stripMargin
  }

  /** Compressed-domain token scrubbing (encode.Scrub semantics): every
    * banned word's token id maps to unk's id; per-document fingerprint is
    * (count, sum, position-weighted sum) — the positional term makes the
    * check order-sensitive. Grouping __tok reproduces the tokenizer's
    * population exactly (documents with zero words never become TokenRows).
    */
  def scrubDecodeSql(bannedWords: Seq[String], unkWord: String): String = {
    val inList = bannedWords.map(w => s"'$w'").mkString(", ")
    s"""WITH $tokenizeCtes,
       |__ban AS MATERIALIZED (SELECT id FROM __vocab WHERE w IN ($inList)),
       |__unk AS MATERIALIZED (SELECT id FROM __vocab WHERE w = '$unkWord'),
       |__m AS (
       |  SELECT doc_id, i,
       |    CASE WHEN tok IN (SELECT id FROM __ban)
       |         THEN (SELECT id FROM __unk) ELSE tok END AS tok
       |  FROM __tok)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       |  CAST(sum(tok) AS BIGINT) AS tok_sum,
       |  CAST(sum(CAST(tok AS BIGINT) * i) AS BIGINT) AS pos_sum
       |FROM __m GROUP BY doc_id""".stripMargin
  }

  /** Compressed-domain vocabulary remap (encode.Scrub.remap semantics):
    * each (fromWord → toWord) pair rewrites that token id element-wise,
    * ONCE per token — the LEFT-JOIN formulation is inherently non-chaining,
    * so a swap pair {a→b, b→a} exchanges the two, exactly like the chunk
    * rewrite. Fingerprint identical to scrubDecodeSql.
    */
  def remapDecodeSql(pairs: Seq[(String, String)]): String = {
    val values = pairs.map { case (k, v) => s"('$k', '$v')" }.mkString(", ")
    s"""WITH $tokenizeCtes,
       |__map AS MATERIALIZED (
       |  SELECT vk.id AS kid, vv.id AS vid
       |  FROM (VALUES $values) AS p(kw, vw)
       |  JOIN __vocab vk ON vk.w = p.kw
       |  JOIN __vocab vv ON vv.w = p.vw),
       |__m AS (
       |  SELECT t.doc_id, t.i, coalesce(m.vid, t.tok) AS tok
       |  FROM __tok t LEFT JOIN __map m ON t.tok = m.kid)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       |  CAST(sum(tok) AS BIGINT) AS tok_sum,
       |  CAST(sum(CAST(tok AS BIGINT) * i) AS BIGINT) AS pos_sum
       |FROM __m GROUP BY doc_id""".stripMargin
  }

  /** Compressed-domain deletion as dedup MATERIALIZATION (encode.Delete
    * semantics): exact-duplicate losers (every doc whose text group has a
    * smaller doc_id) are deleted from the encoded table; the fingerprint
    * runs over the SURVIVORS — identical shape to scrubDecodeSql so a row
    * deleted too many/few times, or a mis-spliced surviving row, fails.
    * The mod-7 takedown slice mirrors the Spark side's deterministic
    * deletion (exact dups alone are absent at small scale factors).
    */
  def deleteDecodeSql: String =
    s"""WITH $tokenizeCtes,
       |__keep AS MATERIALIZED (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep
       |    FROM documents)
       |  WHERE doc_id = rep AND doc_id % 7 <> 0)
       |SELECT CAST(t.doc_id AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       |  CAST(sum(tok) AS BIGINT) AS tok_sum,
       |  CAST(sum(CAST(tok AS BIGINT) * i) AS BIGINT) AS pos_sum
       |FROM __tok t JOIN __keep k USING (doc_id) GROUP BY t.doc_id""".stripMargin

  /** Compressed-domain truncation (encode.Truncate semantics): every
    * document keeps its first `maxLen` tokens; fingerprint identical to
    * scrubDecodeSql (count, sum, position-weighted sum) so a mis-cut or a
    * reordered splice fails the oracle. Position filter over __tok slices
    * the same tokenizer population (docs with zero words never become
    * TokenRows on the Spark side either).
    */
  def truncateDecodeSql(maxLen: Int): String =
    s"""WITH $tokenizeCtes
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       |  CAST(sum(tok) AS BIGINT) AS tok_sum,
       |  CAST(sum(CAST(tok AS BIGINT) * i) AS BIGINT) AS pos_sum
       |FROM __tok WHERE i <= $maxLen GROUP BY doc_id""".stripMargin

  /** Compressed-domain sentinel injection (encode.Affix semantics): every
    * document gains a BOS at position 1 and an EOS at position n+2; the
    * fingerprint (count, sum, position-weighted sum) pins both sentinel
    * values and positions — original token j shifts from position j to j+1.
    *
    * Precondition (round-5 advisor): this oracle GROUPs the exploded token
    * table, so a zero-token document would have no oracle row while the
    * encoded side emits its sentinel-only fingerprint (n_tok = 2). The
    * driver's corpus generator never produces an empty document (TESTDATA.md
    * fixes ≥10 words per doc; Tokenize maps every corpus word), so the two
    * sides agree on every graded input; feeding a corpus WITH empty
    * documents requires left-joining `documents` here first.
    */
  def affixDecodeSql(bos: Int, eos: Int): String =
    s"""WITH $tokenizeCtes
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(count(*) + 2 AS BIGINT) AS n_tok,
       |  CAST(sum(tok) + $bos + $eos AS BIGINT) AS tok_sum,
       |  CAST($bos + sum(CAST(tok AS BIGINT) * (i + 1)) + $eos * (count(*) + 2) AS BIGINT) AS pos_sum
       |FROM __tok GROUP BY doc_id""".stripMargin

  /** Read-side head projection (DecodeHead semantics): per-document sum and
    * count over the first `k` tokens only.
    */
  def headDecodeSql(k: Int): String =
    s"""WITH $tokenizeCtes
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(sum(tok) AS BIGINT) AS head_sum,
       |  CAST(count(*) AS BIGINT) AS n_head
       |FROM __tok WHERE i <= $k GROUP BY doc_id""".stripMargin

  /** Read-side tail projection (DecodeTail semantics): per-document sum and
    * count over the LAST `k` tokens, with builtin slice semantics — a
    * document shorter than k contributes (0, 0), exactly like
    * `slice(tokens, −k, k)` resolving to an empty array.
    */
  def tailDecodeSql(k: Int): String =
    s"""WITH $tokenizeCtes,
       |__n AS (SELECT doc_id, count(*) AS n FROM __tok GROUP BY doc_id)
       |SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       |  CAST(sum(CASE WHEN n.n >= $k AND t.i > n.n - $k THEN t.tok ELSE 0 END) AS BIGINT) AS tail_sum,
       |  CAST(sum(CASE WHEN n.n >= $k AND t.i > n.n - $k THEN 1 ELSE 0 END) AS BIGINT) AS n_tail
       |FROM __tok t JOIN __n n USING (doc_id) GROUP BY t.doc_id""".stripMargin

  /** Read-side mid-window projection (DecodeSlice semantics): per-document
    * sum and count over `slice(tokens, s, k)` for a positive mid start AND a
    * negative non-tail start (`slice(tokens, -s2, k2)` with k2 < s2) — exact
    * builtin semantics: the positive window is 1-based [s, s+k−1] clipped at
    * the row end; the negative window covers 1-based [n−s2+1, n−s2+k2] and is
    * EMPTY for documents shorter than s2.
    */
  def sliceDecodeSql(s: Int, k: Int, s2: Int, k2: Int): String =
    s"""WITH $tokenizeCtes,
       |__n AS (SELECT doc_id, count(*) AS n FROM __tok GROUP BY doc_id)
       |SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       |  CAST(sum(CASE WHEN t.i >= $s AND t.i < $s + $k THEN t.tok ELSE 0 END) AS BIGINT) AS mid_sum,
       |  CAST(sum(CASE WHEN t.i >= $s AND t.i < $s + $k THEN 1 ELSE 0 END) AS BIGINT) AS n_mid,
       |  CAST(sum(CASE WHEN n.n >= $s2 AND t.i > n.n - $s2 AND t.i <= n.n - $s2 + $k2 THEN t.tok ELSE 0 END) AS BIGINT) AS win_sum,
       |  CAST(sum(CASE WHEN n.n >= $s2 AND t.i > n.n - $s2 AND t.i <= n.n - $s2 + $k2 THEN 1 ELSE 0 END) AS BIGINT) AS n_win
       |FROM __tok t JOIN __n n USING (doc_id) GROUP BY t.doc_id""".stripMargin

  /** SimHash near-dup pairs (Dedup.simhashPairs semantics): unigram
    * splitmix64 → 64-bit majority signature → 4×16-bit band buckets →
    * exact Hamming ≤ maxHamming.
    */
  def simhashSql(maxHamming: Int = 3): String = {
    val (m1, last) = mix64Ctes("__sh", "__tok", Seq("doc_id"), "CAST(tok AS UBIGINT)")
    s"""WITH $tokenizeCtes,
       |$m1,
       |__bits AS MATERIALIZED (
       |  SELECT doc_id, CAST(b.range AS INT) AS b,
       |         sum(CASE WHEN (z >> CAST(b.range AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS acc
       |  FROM $last, range(64) b GROUP BY 1, 2),
       |__sig0 AS (
       |  SELECT doc_id, CAST(sum(CASE WHEN acc > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END) AS UBIGINT) AS sig
       |  FROM __bits GROUP BY 1),
       |__sig AS MATERIALIZED (
       |  SELECT d.doc_id, COALESCE(s.sig, 0::UBIGINT) AS sig
       |  FROM documents d LEFT JOIN __sig0 s ON d.doc_id = s.doc_id),
       |__banded AS (
       |  SELECT doc_id, sig, b4.range AS band, (sig >> CAST(b4.range * 16 AS INT)) & 65535 AS bh
       |  FROM __sig, range(4) b4),
       |__cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
       |  FROM __banded a JOIN __banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
       |SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       |       CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
       |FROM __cand WHERE bit_count(xor(sa, sb)) <= $maxHamming""".stripMargin
  }

  /** Winnowing fingerprint pairs (TextAnalysis.fingerprintPairs semantics):
    * k-gram chained splitmix64 hashes, unsigned minimum per window of w,
    * distinct per doc, pairs sharing ≥ minShared values.
    */
  def fingerprintSql(k: Int = 5, w: Int = 4, minShared: Int = 2): String = {
    val ctes = new StringBuilder(tokenizeCtes)
    ctes ++= s""",
      |__a0 AS (SELECT doc_id, i, xor($FNV::UBIGINT, CAST(tok AS UBIGINT)) AS z FROM __tok),
      |""".stripMargin
    var (m, last) = mix64Ctes("__c0", "__a0", Seq("doc_id", "i"), "z")
    ctes ++= m
    for (j <- 1 until k) {
      ctes ++= s""",
        |__a$j AS (SELECT p.doc_id, p.i, xor(p.z, CAST(t.tok AS UBIGINT)) AS z
        |  FROM $last p JOIN __tok t ON t.doc_id = p.doc_id AND t.i = p.i + $j),
        |""".stripMargin
      val r = mix64Ctes(s"__c$j", s"__a$j", Seq("doc_id", "i"), "z")
      ctes ++= r._1
      last = r._2
    }
    s"""WITH ${ctes.result()},
       |__kg AS MATERIALIZED (SELECT doc_id, i, z, count(*) OVER (PARTITION BY doc_id) AS m FROM $last),
       |__win AS (
       |  SELECT doc_id, min(z) OVER (PARTITION BY doc_id ORDER BY i
       |           ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS minh, i, m
       |  FROM __kg),
       |__fp AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, minh FROM __win WHERE i <= greatest(m - $w, 0) + 1)
       |SELECT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b, count(*) AS shared
       |FROM __fp a JOIN __fp b ON a.minh = b.minh AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $minShared""".stripMargin
  }

  /** Hyperplane sign bitmasks for (seed, nTables, nBits) — the same
    * constants `LshBuckets` derives per row, precomputed once and embedded
    * as a VALUES literal.
    */
  private def hyperplaneValues(seed: Long, nBits: Int, nTables: Int, dims: Int): String = {
    val rows = for (t <- 0 until nTables; b <- 0 until nBits) yield {
      var mask = BigInt(0)
      for (d <- 0 until dims)
        if ((Hashing.mix64(seed + 1000L * t + b.toLong * 131071L + d) & 1L) == 1L)
          mask = mask.setBit(d)
      s"($t, $b, $mask::UBIGINT)"
    }
    rows.mkString(", ")
  }

  /** CTEs assigning every embedding its per-table LSH bucket. */
  private def bucketCtes(seed: Long, nBits: Int, nTables: Int, dims: Int): String =
    s"""__hp(t, b, mask) AS (VALUES ${hyperplaneValues(seed, nBits, nTables, dims)}),
       |__dots AS MATERIALIZED (
       |  -- list_sum over list_transform accumulates left-to-right in dim
       |  -- order — the same ascending-d double accumulation LshBuckets
       |  -- performs, so a dot product near 0 cannot flip sign between the
       |  -- two sides (a plain SQL SUM has unspecified order).
       |  SELECT e.vec_id, h.t, h.b,
       |         list_sum(list_transform(range($dims), d ->
       |           e.embedding[CAST(d AS INT) + 1] *
       |           (CASE WHEN (h.mask >> CAST(d AS INT)) & 1 = 1 THEN 1.0 ELSE -1.0 END))) AS dot
       |  FROM embeddings e, __hp h),
       |__bkt AS MATERIALIZED (
       |  SELECT vec_id, t, sum(CASE WHEN dot >= 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0::BIGINT END) AS bucket
       |  FROM __dots GROUP BY 1, 2)""".stripMargin

  /** LSH-blocked embedding near-dups (Dedup.embeddingNearDups semantics):
    * candidates share a bucket in any table; exact-cosine confirm.
    */
  def embeddingNearDupsSql(tau: Double, nBits: Int, nTables: Int,
                           seed: Long, dims: Int = 64): String =
    s"""WITH ${bucketCtes(seed, nBits, nTables, dims)},
       |__cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM __bkt a JOIN __bkt b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT c.vec_a, c.vec_b FROM __cand c
       |JOIN embeddings ea ON ea.vec_id = c.vec_a
       |JOIN embeddings eb ON eb.vec_id = c.vec_b
       |WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= $tau""".stripMargin

  /** ANN via multi-table LSH (Similarity.lshTopK semantics): candidates
    * share a bucket with the query vector; exact top-k by cosine.
    */
  def annLshSql(queryId: Long, k: Int, nBits: Int, nTables: Int,
                seed: Long, dims: Int = 64): String =
    s"""WITH ${bucketCtes(seed, nBits, nTables, dims)},
       |__qb AS (SELECT t, bucket FROM __bkt WHERE vec_id = $queryId),
       |__cand AS (
       |  SELECT DISTINCT b.vec_id FROM __bkt b JOIN __qb q ON b.t = q.t AND b.bucket = q.bucket
       |  WHERE b.vec_id <> $queryId)
       |SELECT c.vec_id FROM __cand c
       |JOIN embeddings e ON e.vec_id = c.vec_id
       |JOIN embeddings q ON q.vec_id = $queryId
       |ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, c.vec_id
       |LIMIT $k""".stripMargin

  /** Sign-centroid masks for the SQL-reproducible IVF quantizer (bit d of
    * mask t = mix64(seed + 1000t + d) & 1 — the same constants SignDots
    * derives per row).
    */
  private def signCentroidValues(seed: Long, nlist: Int, dims: Int): String = {
    val rows = for (t <- 0 until nlist) yield {
      var mask = BigInt(0)
      for (d <- 0 until dims)
        if ((Hashing.mix64(seed + 1000L * t + d) & 1L) == 1L) mask = mask.setBit(d)
      s"($t, $mask::UBIGINT)"
    }
    rows.mkString(", ")
  }

  /** IVF ANN with the seeded sign-vector quantizer
    * (Similarity.ivfSignTopK semantics): cell = argmax centroid dot with
    * (dot desc, t asc) tie-break; probe the query's top-nprobe cells; exact
    * cosine top-k over the probed cells.
    */
  def ivfSignSql(queryId: Long, k: Int, nlist: Int, nprobe: Int,
                 seed: Long, dims: Int = 64): String =
    s"""WITH __sc(t, mask) AS (VALUES ${signCentroidValues(seed, nlist, dims)}),
       |__dots AS MATERIALIZED (
       |  -- ordered list_sum: same ascending-d accumulation as SignDots
       |  -- (see bucketCtes note on float-sum determinism)
       |  SELECT e.vec_id, s.t,
       |         list_sum(list_transform(range($dims), d ->
       |           e.embedding[CAST(d AS INT) + 1] *
       |           (CASE WHEN (s.mask >> CAST(d AS INT)) & 1 = 1 THEN 1.0 ELSE -1.0 END))) AS dot
       |  FROM embeddings e, __sc s),
       |__cell AS MATERIALIZED (
       |  SELECT vec_id, t AS cell FROM (
       |    SELECT vec_id, t, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, t) AS rn
       |    FROM __dots) WHERE rn = 1),
       |__probe AS (
       |  SELECT t FROM (
       |    SELECT t, row_number() OVER (ORDER BY dot DESC, t) AS rn
       |    FROM __dots WHERE vec_id = $queryId) WHERE rn <= $nprobe)
       |SELECT c.vec_id FROM __cell c
       |JOIN __probe p ON c.cell = p.t
       |JOIN embeddings e ON e.vec_id = c.vec_id
       |JOIN embeddings q ON q.vec_id = $queryId
       |WHERE c.vec_id <> $queryId
       |ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, c.vec_id
       |LIMIT $k""".stripMargin

  /** IVF-SQ8 (Quantize.ivfSq8Query semantics): same cell assignment and
    * probe selection as ivfSignSql, but candidates are ranked by cosine in
    * the INT8-QUANTIZED domain — codes recomputed from the floats exactly
    * as quantize_i8 (round-half-away-from-zero via the floor form, scale =
    * max|x|/127), inner products exact in double (codes ≤ 127). Emits the
    * integer dot/norm triple, so the match is bit-exact.
    */
  def ivfSq8Sql(queryId: Long, k: Int, nlist: Int, nprobe: Int,
                seed: Long, dims: Int = 64): String =
    s"""WITH __sc(t, mask) AS (VALUES ${signCentroidValues(seed, nlist, dims)}),
       |__dots AS MATERIALIZED (
       |  SELECT e.vec_id, s.t,
       |         list_sum(list_transform(range($dims), d ->
       |           e.embedding[CAST(d AS INT) + 1] *
       |           (CASE WHEN (s.mask >> CAST(d AS INT)) & 1 = 1 THEN 1.0 ELSE -1.0 END))) AS dot
       |  FROM embeddings e, __sc s),
       |__cell AS MATERIALIZED (
       |  SELECT vec_id, t AS cell FROM (
       |    SELECT vec_id, t, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, t) AS rn
       |    FROM __dots) WHERE rn = 1),
       |__probe AS (
       |  SELECT t FROM (
       |    SELECT t, row_number() OVER (ORDER BY dot DESC, t) AS rn
       |    FROM __dots WHERE vec_id = $queryId) WHERE rn <= $nprobe),
       |__qs AS (
       |  SELECT vec_id, embedding,
       |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127 AS sc
       |  FROM embeddings),
       |__qt AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x ->
       |      CASE WHEN sc = 0 THEN CAST(0 AS DOUBLE)
       |           WHEN CAST(x AS DOUBLE) >= 0 THEN floor(CAST(x AS DOUBLE)/sc + 0.5)
       |           ELSE -floor(-CAST(x AS DOUBLE)/sc + 0.5) END) AS q
       |  FROM __qs),
       |__qq AS (SELECT q AS qa FROM __qt WHERE vec_id = $queryId)
       |SELECT b.vec_id,
       |  CAST(list_inner_product(qa, b.q) AS BIGINT) AS dot_qq,
       |  CAST(list_inner_product(qa, qa) AS BIGINT) AS norm_a,
       |  CAST(list_inner_product(b.q, b.q) AS BIGINT) AS norm_b
       |FROM __qt b
       |JOIN __cell c ON c.vec_id = b.vec_id
       |JOIN __probe p ON c.cell = p.t
       |CROSS JOIN __qq
       |WHERE b.vec_id <> $queryId
       |ORDER BY list_inner_product(qa, b.q)
       |           / sqrt(list_inner_product(qa, qa) * list_inner_product(b.q, b.q)) DESC,
       |         b.vec_id
       |LIMIT $k""".stripMargin

  /** Language-ID prediction histogram (TextAnalysis.langId semantics):
    * per-language stopword-profile scores, argmax with alphabetical-first
    * tie-break, 'und' when no profile matches. Profiles are read from
    * TextAnalysis.LangProfiles so the two sides cannot drift.
    */
  /** Bigram heavy hitters: exact adjacent-pair counts over the reproduced
    * positional tokenization (__tok carries positions, so the self-join on
    * i+1 is the bigram relation), deterministic (count desc, t1, t2)
    * tiebreak — the oracle for the compressed-domain pair-count kernel.
    */
  def bigramTopKSql(k: Int): String =
    s"""WITH $tokenizeCtes,
       |__bg AS (
       |  SELECT a.tok AS t1, b.tok AS t2
       |  FROM __tok a JOIN __tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1)
       |SELECT CAST(t1 AS BIGINT) AS t1, CAST(t2 AS BIGINT) AS t2, count(*) AS n
       |FROM __bg GROUP BY 1, 2 ORDER BY n DESC, t1, t2 LIMIT $k""".stripMargin

  /** Vocabulary heavy hitters (TextAnalysis.vocabTopK semantics): exact
    * token counts over the reproduced tokenization (same sorted-distinct
    * vocab ids), deterministic (count desc, token asc) tiebreak.
    */
  def vocabTopKSql(k: Int): String =
    s"""WITH $tokenizeCtes
       |SELECT CAST(tok AS BIGINT) AS tok, count(*) AS n
       |FROM __tok GROUP BY tok ORDER BY n DESC, tok LIMIT $k""".stripMargin

  def langIdSql(): String = {
    val profiles = graft.pipeline.TextAnalysis.LangProfiles.toSeq.sortBy(_._1)
    val scoreCols = profiles.map { case (lang, words) =>
      val lit = words.map(w => s"'$w'").mkString("[", ",", "]")
      s"CAST(len(list_intersect(words, $lit)) AS DOUBLE) / greatest(CAST(len(words) AS DOUBLE), 1.0) AS s_$lang"
    }.mkString(",\n    ")
    val best = profiles.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
    val whens = profiles.map { case (l, _) => s"WHEN s_$l = $best THEN '$l'" }.mkString("\n              ")
    s"""WITH __lw AS MATERIALIZED (
       |  SELECT doc_id, list_distinct(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS words
       |  FROM documents),
       |__ls AS (
       |  SELECT doc_id,
       |    $scoreCols
       |  FROM __lw),
       |__lp AS (
       |  SELECT CASE WHEN $best <= 0.0 THEN 'und'
       |              $whens
       |              ELSE 'und' END AS pred
       |  FROM __ls)
       |SELECT pred, count(*) AS n FROM __lp GROUP BY pred""".stripMargin
  }
}
