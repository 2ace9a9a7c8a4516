package graft

import graft.encode.{EncodeJob, EncodeOptions}
import graft.spark.SyntheticData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Benchmark main (driver contract): prints ONE JSON line.
  *
  * Two parts:
  * 1. headline driver-contract queries at SPARK_GRAFT_SF_DIR (wall sec each);
  * 2. the graded encode bench (BASELINE.json#metric): encode throughput
  *    (tokens/s) on the deterministic synthetic token table at TWO
  *    parallelism levels — local[8] vs local[32] on identical input, the
  *    sandbox stand-in for N vs 4N executors (BASELINE.md §6.2) — plus
  *    scaling efficiency and compressed bytes/token.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    // Scan splits must outnumber threads for decent packing: the ~0.8 GB
    // bench input is only ~7 splits at the default 128 MB, which leaves
    // threads idle at local[8]/[32] and under-reports scaling. Aim for
    // ≥3–4 waves of map tasks per thread (SCALE.md §4 tuning knob).
    //
    // Shuffle compression stays at Spark's DEFAULT (lz4 on) for EVERY
    // session. Round 2 turned it off for the encode bench (the varint
    // block payload made lz4 pure overhead when the reduce was CPU-bound);
    // after the round-3 reduce restructuring the 32-thread case is
    // bandwidth-bound and lz4's byte reduction through the (tmpfs) shuffle
    // measured ≥neutral at local[32] while the A/B'd eff(8→32) rose
    // 0.515→0.574 (BASELINE.md §6.5). A real multi-executor cluster
    // shuffles over the network, where compression is unambiguous —
    // default-respecting is also the honest deployment shape.
    // SPARK_GRAFT_SHUFFLE_COMPRESS=false restores the round-2 behavior
    // for A/B (ScaleProbe honors the same switch).
    val compress = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true")
    val maxPartitionBytes = math.max((1L << 30) / (4L * cpus), 16L << 20)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes.toString)
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/spark-tmp") // shuffle on tmpfs: stable timings
      .config("spark.shuffle.compress", compress)
      .config("spark.shuffle.spill.compress", compress)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Encode the synthetic table end-to-end (read parquet → explicit bucket
    * shuffle → chunk encode → count+size), returning (seconds, tokens, bytes).
    */
  private def encodeRun(spark: SparkSession, input: org.apache.spark.sql.Dataset[graft.format.TokenRow],
                        buckets: Int): (Double, Long, Long) = {
    val t0 = System.nanoTime()
    val chunks = EncodeJob.encode(input, EncodeOptions(numBuckets = buckets))
    val (toks, bytes, _) = EncodeJob.sizeReport(chunks)
    val sec = (System.nanoTime() - t0) / 1e9
    (sec, toks, bytes)
  }

  /** 1-minute system load average (OS-reported, includes our own JVM once
    * work starts — the START reading is the neighbor-contention signal).
    */
  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val loadStart = loadAvg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 2M rows: the fixed per-run overhead (~0.65 s of job setup + stage
    // barriers + parquet listing, measured by solving t = W/p + c from quiet
    // 2/8-thread pairs) otherwise caps measurable eff(2->8) near 0.86 even
    // for a perfectly scaling job; doubling W halves the bias.
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "2000000").toLong

    // ---- part 1: headline queries ------------------------------------
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var spark = session(cpus.toInt)
    // One-time session costs (expression registration, parquet listing,
    // codegen compiler warm-up) otherwise land entirely on whichever query
    // sorts first and distort ITS number; a tiny sf0.001 flagship run pays
    // them up front. Per-query caches (chunk tables, tokenization) still
    // charge to the first query that needs them — that cost is real work.
    try SparkEntry.entry(spark).count() catch {
      case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable => System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
      }
      // -1 marks a failed query; a silent catch would disguise regressions
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

    // ---- part 2: encode throughput at two parallelism levels ---------
    // materialize the deterministic input once (generation excluded from timing)
    val inputPath = s"/tmp/graft_bench_input_$benchRows"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(inputPath))) {
      SyntheticData.tokenTable(spark, benchRows, 64)
        .write.mode("overwrite").parquet(inputPath)
    }
    // Measurement methodology: the host VM has multi-second noise windows,
    // so per-level measurements are INTERLEAVED across rounds (a noise
    // window hits all levels, not one) and the per-level minimum is taken —
    // the stable estimator of achievable throughput. First round is
    // preceded by 2 warm-up runs (JIT; generated classes persist across
    // sessions in the same JVM).
    var toks = 0L
    var bytes = 0L
    val levelTimes = scala.collection.mutable.Map(32 -> Double.MaxValue,
      8 -> Double.MaxValue, 2 -> Double.MaxValue)
    val roundTimes = scala.collection.mutable.ArrayBuffer.empty[Map[Int, Double]]
    // NOTE: must run only after every other session is stopped — getOrCreate
    // in the same JVM returns the live session regardless of master.
    // Levels are measured INTERLEAVED per round: the host (a Firecracker
    // microVM with invisible neighbor contention) drifts on a minutes scale,
    // so the scaling ratio is computed within a round — all levels see the
    // same conditions — and the best (least-contended) round is reported.
    def measureAllLevels(): Unit = {
      var firstRound = true
      // 4 rounds, each level the MIN OF THREE back-to-back runs: contention
      // spikes are multi-second and intermittent, so a per-(round, level)
      // min-of-3 is clean unless the spike outlasts all three runs; the
      // median over 4 round-ratios then tolerates a fully-contaminated round.
      for (round <- 1 to 4) {
        val thisRound = scala.collection.mutable.Map.empty[Int, Double]
        for (cpus <- Seq(32, 8, 2)) {
          val s = session(cpus)
          // one Dataset per session: file listing + schema resolution happen
          // once, not inside every timed run (they are driver-side overhead
          // a real recurring job would amortize via its catalog)
          val input = { import s.implicits._; s.read.parquet(inputPath).as[graft.format.TokenRow] }
          if (firstRound) encodeRun(s, input, 64) // JIT warm-up
          val (sec1, t, b) = encodeRun(s, input, 64)
          val (sec2, _, _) = encodeRun(s, input, 64)
          val (sec3, _, _) = encodeRun(s, input, 64)
          val sec = math.min(math.min(sec1, sec2), sec3)
          toks = t; bytes = b
          thisRound(cpus) = sec
          if (sec < levelTimes(cpus)) levelTimes(cpus) = sec
          s.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
        }
        roundTimes += thisRound.toMap
        firstRound = false
      }
      // Adaptive extension: on clean windows the median and min-based
      // estimators agree within ~0.01; divergence means host contention
      // contaminated rounds. Buy up to 2 extra rounds to let the minima
      // converge (bounded — a contention window outlasting the whole bench
      // cannot be measured around, only documented).
      var extra = 0
      def medianE = medianRoundEff(8, 2)
      def minE = levelTimes(2) / (4 * levelTimes(8))
      // the 8→32 pair is the noisier one (local[32] absorbs all host
      // contention); extend on ITS estimator divergence too
      def medianE32 = medianRoundEff(32, 8)
      def minE32 = levelTimes(8) / (4 * levelTimes(32))
      while (extra < 3 && (math.abs(medianE - minE) > 0.02 ||
                           math.abs(medianE32 - minE32) > 0.04)) {
        val thisRound = scala.collection.mutable.Map.empty[Int, Double]
        for (cpus <- Seq(32, 8, 2)) {
          val s = session(cpus)
          val input = { import s.implicits._; s.read.parquet(inputPath).as[graft.format.TokenRow] }
          val secs = (1 to 3).map(_ => encodeRun(s, input, 64)._1)
          val sec = secs.min
          thisRound(cpus) = sec
          if (sec < levelTimes(cpus)) levelTimes(cpus) = sec
          s.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
        }
        roundTimes += thisRound.toMap
        extra += 1
      }
    }
    def measure(cpus: Int): Double = levelTimes(cpus)
    // Estimators, noisiest to cleanest:
    // - median of per-round paired ratios (robust, but a contaminated level
    //   inside a round biases that round's ratio in either direction);
    // - best round (least-contended round, capped at 1.0);
    // - MIN-BASED: min over all runs per level. External contention only
    //   ever ADDS time, so each level's min converges on its true clean
    //   cost and the min ratio estimates uncontended scaling.
    def medianRoundEff(hi: Int, lo: Int): Double = {
      val sorted = roundTimes.map(r => (r(lo) / r(hi)) / 4.0).sorted
      sorted(sorted.length / 2)
    }
    def bestRoundEff(hi: Int, lo: Int): Double =
      math.min(roundTimes.map(r => (r(lo) / r(hi)) / 4.0).max, 1.0)
    // ---- part 3: the reference's headline comparison (raw vs compressed
    // LIKE scan, /root/reference/src/BenchmarkDriver.cpp:81-83): contains-
    // pattern over the synthetic corpus via (a) raw token arrays, (b) full
    // decode-then-match, (c) compressed-domain DFA with bloom chunk-skip,
    // (d) compressed match + decode-only-matches.
    val patternBench = {
      val sparkS = spark
      import sparkS.implicits._
      import graft.query.Graft
      import graft.format.TokenRow
      // longest planted phrase → selective pattern (bloom skip + DFA early
      // exit actually matter; a 2-token phrase matches ~10% of rows)
      val pat = (0 until 64).map(SyntheticData.hotPhrase).maxBy(_.length).toSeq
      val input = spark.read.parquet(inputPath)
      // materialize the chunk table to parquet so raw and compressed scans
      // both read from storage (fair comparison; page cache warms both).
      // The path carries a format tag: chunk-format changes (e.g. the crc
      // now covering symtab+offsets+doc_ids) must invalidate this cache.
      val chunksPath = s"${inputPath}_chunks_fsst_v3"
      if (!fs.exists(new org.apache.hadoop.fs.Path(chunksPath))) {
        EncodeJob.encode(input.as[TokenRow],
          EncodeOptions(numBuckets = 64, forceCodec = Some("fsst")))
          .write.mode("overwrite").parquet(chunksPath)
      }
      val chunks = spark.read.parquet(chunksPath).as[graft.format.EncodedChunk]
      // The engine's PRODUCT table: auto-selected codecs (dict/RLE/FoR/
      // bitpack/FSST per chunk stats) — what EncodeJob.encode emits by
      // default, and the fair "compressed" side of raw-vs-compressed (the
      // reference's own bench compares raw vs ITS engine format,
      // /root/reference/src/BenchmarkDriver.cpp:81-83).
      val autoPath = s"${inputPath}_chunks_auto_v3"
      if (!fs.exists(new org.apache.hadoop.fs.Path(autoPath))) {
        EncodeJob.encode(input.as[TokenRow], EncodeOptions(numBuckets = 64))
          .write.mode("overwrite").parquet(autoPath)
      }
      val autoChunks = spark.read.parquet(autoPath)
      def best(f: => Long): (Long, Double) = {
        f // warm
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val n = f
          (n, (System.nanoTime() - t0) / 1e9)
        }.minBy(_._2)
      }
      // The four headline variants are measured INTERLEAVED (2 warm laps —
      // JIT tiers the match kernel during the first — then 3 timed laps,
      // min per variant): measuring each variant in its own block let
      // warm-up and host drift land entirely on whichever ran first
      // (round-2's compressed number was 1.7× raw from exactly that).
      val variants: Seq[(String, () => Long)] = Seq(
        "raw" -> (() => input.filter(Graft.containsTokens(col("tokens"), pat)).count()),
        "dec" -> (() => EncodeJob.decode(chunks).toDF()
          .filter(Graft.containsTokens(col("tokens"), pat)).count()),
        "cmp" -> (() => Graft.scanPattern(autoChunks, graft.core.PatternMode.Contains, Seq(pat)).count()),
        "fsst" -> (() => Graft.scanPattern(chunks.toDF(), graft.core.PatternMode.Contains, Seq(pat)).count()),
        "late" -> (() => Graft.scanAndDecode(chunks, graft.core.PatternMode.Contains, Seq(pat)).count())
      )
      val counts = scala.collection.mutable.Map.empty[String, Long]
      val times = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
      for (lap <- 1 to 5; (name, f) <- variants) {
        val t0 = System.nanoTime()
        val n = f()
        val sec = (System.nanoTime() - t0) / 1e9
        counts(name) = n
        if (lap > 2 && sec < times(name)) times(name) = sec
      }
      val (nRaw, tRaw) = (counts("raw"), times("raw"))
      val (nDec, tDec) = (counts("dec"), times("dec"))
      val (nCmp, tCmp) = (counts("cmp"), times("cmp"))
      val (nFsst, tFsst) = (counts("fsst"), times("fsst"))
      val (nLate, tLate) = (counts("late"), times("late"))
      require(nRaw == nDec && nDec == nCmp && nCmp == nLate && nLate == nFsst,
        s"pattern-scan paths disagree: $nRaw $nDec $nCmp $nFsst $nLate")

      // Per-codec scan-vs-decode pairs (dict / rle / bitpack-prefix /
      // bitpack-contains / fsst-suffix / range). These sub-second readings
      // flipped between windows when each side was timed in its own block
      // (round-5 committed window: dict read 0.927/0.560 vs round-4's
      // 0.070/0.086 — a window shift mid-pair), so ALL pair variants are
      // measured INTERLEAVED in one loop: 2 warm laps, then min of 3, the
      // same discipline as the headline variants.
      import graft.spark.Tokenize
      val (docsTok, v) = Tokenize.documents(spark, sfDir)
      val dictChunks = EncodeJob.encode(docsTok,
        EncodeOptions(numBuckets = 8, forceCodec = Some("dict"))).toDF().cache()
      val dictPat = Seq(v("value"), v("table"))
      val ev = Tokenize.eventTypes(spark, sfDir)
      val rleChunks = EncodeJob.encode(ev,
        EncodeOptions(numBuckets = 8, forceCodec = Some("rle"))).toDF().cache()
      val rlePat = Seq(0, 0, 0)
      val li = Tokenize.lineitemQuantities(spark, sfDir)
      val bpChunks = EncodeJob.encode(li,
        EncodeOptions(numBuckets = 8, forceCodec = Some("bitpack"))).toDF().cache()
      val bpPat = Seq(1)
      val bpCPat = Seq(7, 7)
      val sfxPat = pat.takeRight(2)
      val (rLo, rHi) = (pat.min, pat.min + 3)
      val pairVariants: Seq[(String, () => Long)] = Seq(
        "dictS" -> (() =>
          Graft.scanPattern(dictChunks, graft.core.PatternMode.Contains, Seq(dictPat)).count()),
        "dictD" -> (() => EncodeJob.decode(dictChunks.as[graft.format.EncodedChunk]).toDF()
          .filter(Graft.containsTokens(col("tokens"), dictPat)).count()),
        "rleS" -> (() =>
          Graft.scanPattern(rleChunks, graft.core.PatternMode.Contains, Seq(rlePat)).count()),
        "rleD" -> (() => EncodeJob.decode(rleChunks.as[graft.format.EncodedChunk]).toDF()
          .filter(Graft.containsTokens(col("tokens"), rlePat)).count()),
        // bitpack-domain anchored prefix (PackedAnchor) + bit-phase contains
        "bpS" -> (() =>
          Graft.scanPattern(bpChunks, graft.core.PatternMode.Prefix, Seq(bpPat)).count()),
        "bpD" -> (() => EncodeJob.decode(bpChunks.as[graft.format.EncodedChunk]).toDF()
          .filter(Graft.startsWithTokens(col("tokens"), bpPat)).count()),
        "bpCS" -> (() =>
          Graft.scanPattern(bpChunks, graft.core.PatternMode.Contains, Seq(bpCPat)).count()),
        "bpCD" -> (() => EncodeJob.decode(bpChunks.as[graft.format.EncodedChunk]).toDF()
          .filter(Graft.containsTokens(col("tokens"), bpCPat)).count()),
        // FSST suffix: positional trailing-window matcher vs decode
        "sfxS" -> (() =>
          Graft.scanPattern(chunks.toDF(), graft.core.PatternMode.Suffix, Seq(sfxPat)).count()),
        "sfxD" -> (() => EncodeJob.decode(chunks).toDF()
          .filter(Graft.endsWithTokens(col("tokens"), sfxPat)).count()),
        // token-range: per-codec compressed kernels + zone-map pruning
        "rngS" -> (() => Graft.scanRange(autoChunks, rLo, rHi).count()),
        "rngD" -> (() => EncodeJob.decodeDf(autoChunks)
          .filter(Graft.anyTokenInRange(col("tokens"), rLo, rHi)).count()))
      val pCounts = scala.collection.mutable.Map.empty[String, Long]
      val pTimes = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
      for (lap <- 1 to 5; (name, f) <- pairVariants) {
        val t0 = System.nanoTime()
        val n = f()
        val sec = (System.nanoTime() - t0) / 1e9
        pCounts(name) = n
        if (lap > 2 && sec < pTimes(name)) pTimes(name) = sec
      }
      val (nDictS, tDictS) = (pCounts("dictS"), pTimes("dictS"))
      val (nDictD, tDictD) = (pCounts("dictD"), pTimes("dictD"))
      val (nRleS, tRleS) = (pCounts("rleS"), pTimes("rleS"))
      val (nRleD, tRleD) = (pCounts("rleD"), pTimes("rleD"))
      val (nBpS, tBpS) = (pCounts("bpS"), pTimes("bpS"))
      val (nBpD, tBpD) = (pCounts("bpD"), pTimes("bpD"))
      val (nBpCS, tBpCS) = (pCounts("bpCS"), pTimes("bpCS"))
      val (nBpCD, tBpCD) = (pCounts("bpCD"), pTimes("bpCD"))
      val (nSfxS, tSfxS) = (pCounts("sfxS"), pTimes("sfxS"))
      val (nSfxD, tSfxD) = (pCounts("sfxD"), pTimes("sfxD"))
      val (nRngS, tRngS) = (pCounts("rngS"), pTimes("rngS"))
      val (nRngD, tRngD) = (pCounts("rngD"), pTimes("rngD"))
      require(nDictS == nDictD && nRleS == nRleD && nBpS == nBpD && nBpCS == nBpCD,
        s"packed-domain scans disagree with decode: dict $nDictS/$nDictD rle $nRleS/$nRleD " +
          s"bp $nBpS/$nBpD bpContains $nBpCS/$nBpCD")
      require(nSfxS == nSfxD, s"suffix scan disagrees with decode: $nSfxS/$nSfxD")
      require(nRngS == nRngD, s"range scan disagrees with decode: $nRngS/$nRngD")
      // compressed-domain GROUP BY token (round 5): per-chunk CountMatch
      // histograms (FSST code counting + symbol expansion, RLE run-sums,
      // dict index counts, packed-value counts) merged under partial
      // aggregation, vs full decode + explode + groupBy on the same table.
      // count() = distinct tokens — equality is the cross-assert.
      val (nHistC, tHistC) = best(Graft.tokenHistogram(autoChunks).count())
      val (nHistD, tHistD) = best(
        EncodeJob.decodeDf(autoChunks)
          .select(org.apache.spark.sql.functions.explode(col("tokens")).as("tok"))
          .groupBy("tok").count().count())
      require(nHistC == nHistD, s"compressed histogram disagrees with decode: $nHistC/$nHistD")
      // compressed-domain BIGRAM counts (BPE-merge-style pair statistics):
      // code-transition matrix + symbol expansion per chunk, vs decode +
      // pair-explode + groupBy. count() = distinct bigrams — cross-assert.
      val (nBgC, tBgC) = best(Graft.bigramHistogram(autoChunks).count())
      val (nBgD, tBgD) = best(
        EncodeJob.decodeDf(autoChunks).filter(col("n_tok") >= 2)
          .select(org.apache.spark.sql.functions.explode(org.apache.spark.sql.functions.expr(
            "transform(sequence(1, size(tokens) - 1), i -> struct(tokens[i-1] AS t1, tokens[i] AS t2))")).as("bg"))
          .groupBy("bg.t1", "bg.t2").count().count())
      require(nBgC == nBgD, s"compressed bigrams disagree with decode: $nBgC/$nBgD")
      // compressed-domain EXACT DEDUP (round 5): per-row 128-bit content
      // hashes straight off the encoded chunks (HashMatch kernels) +
      // groupBy(h1, h2), vs full decode + groupBy(tokens). count() =
      // distinct documents — equality is the cross-assert (a collision at
      // 2M rows would show up here).
      val (nDdC, tDdC) = best(Graft.dedupExactEncoded(autoChunks).count())
      val (nDdD, tDdD) = best(
        EncodeJob.decodeDf(autoChunks).groupBy(col("tokens")).count().count())
      require(nDdC == nDdD, s"encoded dedup disagrees with decode: $nDdC/$nDdD")
      // compressed-domain MINHASH SIGNATURES (round 5): rolling-window
      // shingles + 64 lanes streamed off the encoded chunks (sig-only — no
      // gram sets), vs full decode + ShingleHashes + MinHashSig. The XOR of
      // lane 0 across all eligible rows is the cross-assert (order-free,
      // overflow-free; a single differing signature flips it).
      import org.apache.spark.sql.functions.{bit_xor, element_at}
      val (nMhC, tMhC) = best(
        Graft.minhashRowsEncoded(autoChunks, shingleN = 3, numHashes = 64,
            seed = 42L, collectGrams = false)
          .agg(bit_xor(element_at(col("sig"), 1))).collect()(0).getLong(0))
      val (nMhD, tMhD) = best(
        EncodeJob.decodeDf(autoChunks).filter(col("n_tok") >= 3)
          .select(graft.pipeline.PipelineFunctions.minhashSig(
            graft.pipeline.PipelineFunctions.shingleHashes(col("tokens"), 3), 64, 42L).as("sig"))
          .agg(bit_xor(element_at(col("sig"), 1))).collect()(0).getLong(0))
      require(nMhC == nMhD, s"encoded minhash signatures disagree with decode: $nMhC/$nMhD")
      // metadata-plane PACKING (round 5): the packSummary manifest off
      // rowMeta (id slab + one varint per row, zero decode) vs the same
      // two-level prefix sum off full decode. count() = manifest rows.
      // The synthetic table's ids are "doc-<source>-<n>": the numeric
      // suffix is the packing order key (a bare cast would null out).
      val numId = org.apache.spark.sql.functions
        .expr("CAST(substring_index(doc_id, '-', -1) AS BIGINT)")
      val (nPkC, tPkC) = best(
        graft.pipeline.Packing.packSummary(
          Graft.rowMeta(autoChunks).withColumn("doc_id", numId),
          seqLen = 1024, bucketWidth = 4096).count())
      val (nPkD, tPkD) = best(
        graft.pipeline.Packing.packSummary(
          EncodeJob.decodeDf(autoChunks)
            .select(numId.as("doc_id"), col("source"), col("n_tok")),
          seqLen = 1024, bucketWidth = 4096).count())
      require(nPkC == nPkD, s"encoded packing manifest disagrees with decode: $nPkC/$nPkD")
      // LATE-MATERIALIZED SAMPLING (round 5): a 2% deterministic sample —
      // filter the encoded view on splitmix64(xxhash64(doc_id)) BEFORE
      // decode (only survivors pay decode_row) vs decode-everything-then-
      // filter. xxhash64 keys work for ANY id shape; the summed token
      // totals of the sample are the cross-assert.
      def sampleSum(df: org.apache.spark.sql.DataFrame): Long = df
        .filter(graft.pipeline.PipelineFunctions.sampleBucket(
          org.apache.spark.sql.functions.xxhash64(col("doc_id")), 100) < 2)
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.expr("aggregate(tokens, 0L, (a, x) -> a + x)")))
        .collect()(0).getLong(0)
      val (nSmC, tSmC) = best(sampleSum(Graft.encodedRows(autoChunks)))
      val (nSmD, tSmD) = best(sampleSum(EncodeJob.decodeDf(autoChunks)))
      require(nSmC == nSmD, s"late-materialized sample disagrees with decode-all: $nSmC/$nSmD")
      // TOKEN-QUALITY PROFILE pair (round 5): per-doc exact (n_tok,
      // n_distinct, max_run, top_cnt) streamed off the encoded chunks
      // (QualityMatch — one pass, no decode) vs decode + higher-order
      // functions (array_distinct + an aggregate() run-carrying fold; the
      // decoded side skips top_cnt — no O(n) HOF computes a mode — so the
      // encoded kernel does strictly MORE work here). Cross-asserts:
      // sum(n_distinct) and global max(max_run).
      def qualityChecksum(df: org.apache.spark.sql.DataFrame): Long = {
        val r = df.agg(
          org.apache.spark.sql.functions.sum(col("n_distinct")),
          org.apache.spark.sql.functions.max(col("max_run"))).collect()(0)
        r.getLong(0) * 1000L + r.getLong(1)
      }
      val decMaxRun = org.apache.spark.sql.functions.expr(
        "aggregate(tokens, named_struct('prev', CAST(NULL AS INT), 'run', 0, 'best', 0), " +
          "(s, t) -> named_struct('prev', t, " +
          "'run', IF(s.prev IS NOT NULL AND s.prev = t, s.run + 1, 1), " +
          "'best', GREATEST(s.best, IF(s.prev IS NOT NULL AND s.prev = t, s.run + 1, 1))), " +
          "s -> s.best)")
      val (nQlC, tQlC) = best(qualityChecksum(
        Graft.qualityEncoded(autoChunks)
          .select(col("n_distinct").cast("long").as("n_distinct"),
            col("max_run").cast("long").as("max_run"))))
      val (nQlD, tQlD) = best(qualityChecksum(
        EncodeJob.decodeDf(autoChunks).select(
          org.apache.spark.sql.functions.size(
            org.apache.spark.sql.functions.array_distinct(col("tokens")))
            .cast("long").as("n_distinct"),
          decMaxRun.cast("long").as("max_run"))))
      require(nQlC == nQlD, s"encoded quality profile disagrees with decode: $nQlC/$nQlD")
      // EMBEDDING QUANTIZATION scan pair (round 5): brute-force ANN over the
      // stored float32 table vs the int8-quantized form (1 B/dim codes +
      // 8 B scale — pipeline.Quantize), each side reading its own parquet
      // and scoring against the broadcast query vector. The quantized scan
      // moves 4× fewer bytes and scores with integer dots. Result quality
      // is REPORTED (top-10 overlap) rather than require()d: on isotropic
      // synthetic vectors a legitimate boundary swap at rank 10 is possible.
      val benchVecs = sys.env.getOrElse("SPARK_GRAFT_BENCH_VECS", "500000").toLong
      val embPath = s"/tmp/graft_bench_emb_$benchVecs"
      val qembPath = s"/tmp/graft_bench_emb_q_$benchVecs"
      if (!fs.exists(new org.apache.hadoop.fs.Path(qembPath))) {
        val e = graft.spark.SyntheticData.embTable(spark, benchVecs, 64)
        e.write.mode("overwrite").parquet(embPath)
        graft.pipeline.Quantize.quantizeTable(e)
          .write.mode("overwrite").parquet(qembPath)
      }
      import org.apache.spark.sql.functions.{broadcast, desc}
      def annFloatTop10(): Seq[Long] = {
        val e = spark.read.parquet(embPath)
        val q = broadcast(e.filter(col("vec_id") === 0L)
          .select(col("embedding").as("qe")))
        e.filter(col("vec_id") =!= 0L).crossJoin(q)
          .select(col("vec_id"), graft.pipeline.PipelineFunctions
            .cosineSim(col("embedding"), col("qe")).as("c"))
          .orderBy(desc("c"), col("vec_id")).limit(10)
          .collect().toSeq.map(_.getLong(0))
      }
      def annQuantTop10(): Seq[Long] = {
        val e = spark.read.parquet(qembPath)
        val q = broadcast(e.filter(col("vec_id") === 0L).select(col("q").as("qq")))
        e.filter(col("vec_id") =!= 0L).crossJoin(q)
          .select(col("vec_id"), graft.pipeline.Quantize
            .cosineSimI8(col("q"), col("qq")).as("c"))
          .orderBy(desc("c"), col("vec_id")).limit(10)
          .collect().toSeq.map(_.getLong(0))
      }
      val (annFSum, tAnnF) = best(annFloatTop10().sum)
      val (annQSum, tAnnQ) = best(annQuantTop10().sum)
      val annOverlap = annFloatTop10().toSet.intersect(annQuantTop10().toSet).size
      require(annFSum != 0L && annQSum != 0L, "ANN scans returned no candidates")
      dictChunks.unpersist()
      rleChunks.unpersist()
      bpChunks.unpersist()

      // full-decompression throughput (the reference's M4 bench,
      // /root/reference/sketch.cc:1145-1197): decode EVERY row of the
      // auto-codec chunk table from storage, tokens/s
      val (decToks, tDecAll) = best {
        EncodeJob.decodeDf(autoChunks)
          .agg(org.apache.spark.sql.functions.sum(col("n_tok"))).collect()(0).getLong(0)
      }

      f""""pattern_bench":{"hist_tokens":$nHistC,"sec_hist_compressed":$tHistC%.3f,"sec_hist_decode_group":$tHistD%.3f,"bigram_pairs":$nBgC,"sec_bigram_compressed":$tBgC%.3f,"sec_bigram_decode_group":$tBgD%.3f,"dedup_groups":$nDdC,"sec_dedup_hash_compressed":$tDdC%.3f,"sec_dedup_decode_group":$tDdD%.3f,"minhash_sig_xor":$nMhC,"sec_minhash_sig_compressed":$tMhC%.3f,"sec_minhash_sig_decoded":$tMhD%.3f,"matches":$nRaw,"sec_raw_scan":$tRaw%.3f,"sec_decode_then_match":$tDec%.3f,"sec_compressed_scan":$tCmp%.3f,"sec_fsst_forced_scan":$tFsst%.3f,"sec_compressed_late_decode":$tLate%.3f,"dict_matches":$nDictS,"sec_dict_domain_scan":$tDictS%.3f,"sec_dict_decode_match":$tDictD%.3f,"rle_matches":$nRleS,"sec_rle_domain_scan":$tRleS%.3f,"sec_rle_decode_match":$tRleD%.3f,"bitpack_prefix_matches":$nBpS,"sec_bitpack_prefix_scan":$tBpS%.3f,"sec_bitpack_decode_match":$tBpD%.3f,"bitpack_contains_matches":$nBpCS,"sec_bitpack_contains_scan":$tBpCS%.3f,"sec_bitpack_contains_decode_match":$tBpCD%.3f,"suffix_matches":$nSfxS,"sec_fsst_suffix_scan":$tSfxS%.3f,"sec_fsst_suffix_decode_match":$tSfxD%.3f,"range_matches":$nRngS,"sec_range_scan":$tRngS%.3f,"sec_range_decode_match":$tRngD%.3f,"pack_manifest_rows":$nPkC,"sec_pack_encoded":$tPkC%.3f,"sec_pack_decoded":$tPkD%.3f,"sample_tok_sum":$nSmC,"sec_sample_encoded":$tSmC%.3f,"sec_sample_decode_all":$tSmD%.3f,"quality_checksum":$nQlC,"sec_quality_encoded":$tQlC%.3f,"sec_quality_decode_hof":$tQlD%.3f,"ann_vecs":$benchVecs,"ann_top10_overlap":$annOverlap,"sec_ann_float_scan":$tAnnF%.3f,"sec_ann_quantized_scan":$tAnnQ%.3f,"decode_all_tokens":$decToks,"sec_decode_all":$tDecAll%.3f,"decode_tokens_per_sec":${(decToks / tDecAll).toLong}}"""
    }

    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // N vs 4N stand-ins (BASELINE.md §6.2): 8↔32 as prescribed, plus 2↔8
    // where both levels are far from machine saturation (a single shared
    // memory bus makes the under-committed level unrealistically fast).
    measureAllLevels()
    val t32 = measure(32)
    val t8 = measure(8)
    val t2 = measure(2)

    val thr = (t: Double) => toks / t
    val eff8to32 = medianRoundEff(32, 8)
    val eff2to8 = medianRoundEff(8, 2)
    val eff8to32Best = bestRoundEff(32, 8)
    val eff2to8Best = bestRoundEff(8, 2)
    val bytesPerToken = bytes.toDouble / toks

    // Host-cleanliness metadata (round-4 verdict §6): the estimator SPREAD
    // per pair (|median round ratio − min-based|) is the machine-detectable
    // contamination signal — on clean windows the estimators agree within
    // ~0.01–0.02; divergence means host contention moved a level. The
    // thresholds mirror the adaptive-extension triggers above. Load average
    // at bench START reflects neighbors (our own JVM is idle then); the END
    // reading is dominated by our own local[32] work and is recorded only
    // for completeness.
    val loadEnd = loadAvg()
    val spread2to8 = math.abs(medianRoundEff(8, 2) - t2 / (4 * t8))
    val spread8to32 = math.abs(medianRoundEff(32, 8) - t8 / (4 * t32))
    val window = if (spread2to8 <= 0.02 && spread8to32 <= 0.04) "clean" else "contended"
    val hostJson =
      f""""host":{"n_cpus":${Runtime.getRuntime.availableProcessors()},"load_avg_start":$loadStart%.2f,"load_avg_end":$loadEnd%.2f,"est_spread_2_to_8":$spread2to8%.3f,"est_spread_8_to_32":$spread8to32%.3f,"window":"$window"}"""

    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","encode_bench":{"rows":$benchRows,"tokens":$toks,"bytes":$bytes,"bytes_per_token":$bytesPerToken%.4f,"sec_local32":$t32%.3f,"sec_local8":$t8%.3f,"sec_local2":$t2%.3f,"tokens_per_sec_local32":${thr(t32).toLong},"tokens_per_sec_local8":${thr(t8).toLong},"tokens_per_sec_local2":${thr(t2).toLong},"scaling_efficiency_8_to_32":$eff8to32%.3f,"scaling_efficiency_2_to_8":$eff2to8%.3f,"scaling_efficiency_8_to_32_best_round":$eff8to32Best%.3f,"scaling_efficiency_2_to_8_best_round":$eff2to8Best%.3f,"scaling_efficiency_2_to_8_min_based":${"%.3f".format(t2 / (4 * t8))},"scaling_efficiency_8_to_32_min_based":${"%.3f".format(t8 / (4 * t32))}},$hostJson,$patternBench}"""
    // Primary channel: one bare JSON line on stdout (build.sbt routes the
    // forked JVM's stdout through undecorated — no "[info]" prefix). Backup
    // channel: the same line in a file, in case the caller's capture wraps
    // stdout in logger noise again (round-1 BENCH had parsed:null).
    println(json)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: ${e.getMessage}") }
  }
}
