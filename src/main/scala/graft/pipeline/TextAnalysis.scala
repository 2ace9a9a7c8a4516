package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language-ID
  * heuristic, quality scoring, token counting, document fingerprinting.
  * All built from Catalyst built-ins + the pipeline expressions — no UDFs.
  */
object TextAnalysis {
  import PipelineFunctions._

  /** Stopword-profile language-ID heuristic (n-gram/stopword scoring): score
    * each language by the fraction of words in its profile; argmax, or "und"
    * when no profile matches. Profiles are tiny built-in sets — the real
    * system would load fastText-style tables; the *plan shape* (score
    * columns + greatest + case) is the deliverable.
    */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "que"),
    "zh" -> Seq("de0", "shi4", "le0", "zai4", "he2"))

  def langIdScores(words: Column): Seq[(String, Column)] =
    LangProfiles.toSeq.sortBy(_._1).map { case (lang, profile) =>
      val p = typedlit(profile)
      lang -> (size(array_intersect(words, p)).cast("double") /
        greatest(size(array_distinct(words)).cast("double"), lit(1.0)))
    }

  def langId(text: Column): Column = {
    val words = array_distinct(filter(split(trim(text), "\\s+"), w => w =!= lit("")))
    val scores = langIdScores(words)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0.0, lit("und"))) { case (acc, (lang, s)) =>
      acc.when(s === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Quality signals per document: token count, stopword count/ratio,
    * mean word length, and a pass/fail gate — the C4-style filter shape.
    */
  def qualityScore(docs: DataFrame, stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val words = filter(split(trim(col("text")), "\\s+"), w => w =!= lit(""))
    val sw = typedlit(stopwords)
    docs.select(
      col("doc_id"),
      size(words).cast("bigint").as("n_words"),
      size(filter(words, w => array_contains(sw, w))).cast("bigint").as("stop_cnt"),
      length(trim(col("text"))).cast("bigint").as("n_chars"))
      .withColumn("quality_ok",
        col("n_words") >= 10 && col("n_words") <= 5000 &&
          col("stop_cnt") * 2 <= col("n_words"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs | digit runs | single punctuation) — the two standard
    * pre-tokenization size estimates for a training corpus.
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val words = filter(split(trim(col("text")), "\\s+"), w => w =!= lit(""))
    docs.select(
      col("doc_id"),
      size(words).cast("bigint").as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).cast("bigint").as("bpeish_tokens"))
  }

  /** Within-document repetition scoring (the Gopher-style duplicate-n-gram
    * quality signal): total vs distinct n-gram counts per doc over the
    * TOKEN column, plus a repetitive flag at `maxDupRatio`. Pure column
    * expressions on the scan — distinct grams come from the same
    * ShingleHashes kernel the dedup suite uses, total is arithmetic on
    * n_tok — so the filter costs one pass, no shuffle, at any corpus size.
    */
  def repetitionScores(docs: DataFrame, n: Int = 3,
                       maxDupRatio: Double = 0.05): DataFrame =
    docs.filter(col("n_tok") >= n)
      .select(col("doc_id"),
        (col("n_tok") - (n - 1)).cast("bigint").as("total_grams"),
        size(shingleHashes(col("tokens"), n)).cast("bigint").as("distinct_grams"))
      .withColumn("dup_ratio",
        lit(1.0) - col("distinct_grams").cast("double") / col("total_grams"))
      .withColumn("repetitive", col("dup_ratio") > maxDupRatio)

  /** Exact vocabulary heavy hitters: the k most frequent tokens in the
    * corpus with a deterministic (count desc, token asc) tiebreak — the
    * stopword/boilerplate census every tokenizer audit starts from.
    *
    * Scale shape: explode → hash-aggregate benefits from map-side partial
    * aggregation (each task pre-counts its tokens before the shuffle, so
    * shuffle bytes scale with |vocab| per task, not token volume), and the
    * ordered limit compiles to TakeOrderedAndProject — per-partition top-k
    * heaps + a k-row driver merge, never a global sort.
    */
  def vocabTopK(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(col("tokens")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(k)

  /** Exact per-source document-length percentiles via the inverse CDF over
    * a compacted length histogram: groupBy(source, n_tok) first (map-side
    * combinable; output is bounded by the length DOMAIN, not the corpus),
    * then cumulative counts over the tiny histogram and
    * pN = min{ n_tok : cum ≥ ceil(total·N/100) }. All-integer arithmetic —
    * ceil(t·k/100) is computed as (t·k + 99) div 100, so a SQL oracle
    * reproduces it bit-exactly with no floating-point boundary risk.
    * This is how exact quantiles stay cheap at 10^12 docs: the only
    * full-volume pass is the combinable count.
    */
  def lengthPercentiles(docs: DataFrame, ks: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= 100))
    val hist = docs.groupBy(col("source"), col("n_tok"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("n_tok"))
    val wTot = Window.partitionBy(col("source"))
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__tot", sum(col("__c")).over(wTot))
    val aggs = ks.map { k =>
      min(when(col("__cum") >= expr(s"(__tot * $k + 99) div 100"), col("n_tok")))
        .cast("bigint").as(s"p$k")
    }
    cum.groupBy(col("source")).agg(aggs.head, aggs.tail: _*)
  }

  /** Winnowing fingerprints (rolling-hash document signatures): docs sharing
    * many fingerprint values are near-duplicates / containment candidates.
    */
  def fingerprints(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame =
    docs.select(col("doc_id"),
      winnowFingerprint(col("tokens"), k, w).as("fingerprint"))

  /** Fingerprint-sharing pairs: explode + self-join on fingerprint value —
    * the shuffle-on-key plan that replaces all-pairs containment checks.
    *
    * `maxPostings` (off by default — the shipped query is held to an exact
    * SQL oracle) is the 100-TB skew guard: a fingerprint value shared by f
    * documents contributes f² candidate pairs, so web-scale dedup drops
    * values above a document-frequency cap (boilerplate shingles carry no
    * dedup signal anyway). The cap only ever REMOVES candidate pairs whose
    * evidence is a ubiquitous fingerprint — precision is unaffected.
    */
  def fingerprintPairs(docs: DataFrame, k: Int = 5, w: Int = 4, minShared: Int = 2,
                       maxPostings: Option[Int] = None): DataFrame =
    fingerprintConfirmPairs(fingerprints(docs, k, w), minShared, maxPostings)

  /** Explode + self-join + shared-count over a prepared (doc_id, fingerprint)
    * frame — shared by the decoded-domain path above and the
    * compressed-domain path (query/Graft.fingerprintPairsEncoded), so the
    * two differ ONLY in where the fingerprints come from.
    */
  private[graft] def fingerprintConfirmPairs(fps: DataFrame, minShared: Int,
                                             maxPostings: Option[Int]): DataFrame = {
    val fp0 = fps.select(col("doc_id"), explode(col("fingerprint")).as("fp"))
    // Posting frequency in one window pass keyed like the self-join below
    // (exchange planned once, reused by both sides): df = 1 fingerprints
    // cannot form a pair and are dropped exactly — usually most of the
    // posting table — and the df cap (hot values) rides the same pass.
    val wdf = Window.partitionBy(col("fp"))
    val capOk = maxPostings match {
      case Some(cap) => col("__df") <= cap
      case None => lit(true)
    }
    // Pin the reduced posting table: the self-join reads it twice, and each
    // unpinned side re-ran the winnowing kernel + window pass (§8.4 — same
    // shape as Dedup.jaccardConfirmPairs; survivors only, never the corpus).
    val fp = Dedup.pin(fp0.withColumn("__df", count(lit(1)).over(wdf))
      .filter(col("__df") >= 2 && capOk)
      .select(col("doc_id"), col("fp")))
    val a = fp.alias("a")
    val b = fp.alias("b")
    a.join(b, col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
