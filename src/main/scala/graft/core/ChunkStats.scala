package graft.core

import scala.collection.mutable

/** Exact single-pass statistics over a chunk's rows — the generalization of
  * the reference's per-block `used_chars` bitmap
  * (/root/reference/src/BenchmarkDriver.cpp:128-137) into the inputs the codec
  * auto-selector needs (north_star: cardinality / run-length / value-range).
  *
  * `bloom` is a 1024-bit token-presence filter used for chunk skipping
  * (SURVEY.md §4 O4: the chunk-level analog of the required-symbol scan).
  */
final case class ChunkStats(
    rowCount: Int,
    totalTokens: Long,
    minTok: Int,
    maxTok: Int,
    maxRun: Int,
    numRuns: Long,
    varintBytes: Long,                       // exact raw-codec payload size (sans prefixes)
    distinctSorted: Option[Array[Int]],      // exact, iff cardinality <= DictCodec.MaxCard
    distinctEst: Long,
    bloom: Array[Byte]) {

  def mayContainToken(t: Int): Boolean = ChunkStats.bloomHas(bloom, t)
}

object ChunkStats {
  val BloomBits = 1024
  val BloomBytes: Int = BloomBits / 8

  @inline private def mix(t: Int): Int = {
    var h = t * 0x9e3779b1
    h ^= h >>> 16
    h
  }
  @inline def bloomSet(b: Array[Byte], t: Int): Unit = {
    val h = mix(t) & (BloomBits - 1)
    b(h >>> 3) = (b(h >>> 3) | (1 << (h & 7))).toByte
  }
  @inline def bloomHas(b: Array[Byte], t: Int): Boolean = {
    val h = mix(t) & (BloomBits - 1)
    (b(h >>> 3) & (1 << (h & 7))) != 0
  }

  def compute(rows: IndexedSeq[Array[Int]]): ChunkStats = {
    var minT = Int.MaxValue
    var maxT = Int.MinValue
    var maxRun = 0
    var runs = 0L
    var total = 0L
    var vbytes = 0L
    val bloom = new Array[Byte](BloomBytes)
    val distinct = mutable.HashSet.empty[Int]
    var overflow = false

    var ri = 0
    while (ri < rows.length) {
      val toks = rows(ri)
      val n = toks.length
      total += n
      var i = 0
      while (i < n) {
        val v = toks(i)
        if (v < minT) minT = v
        if (v > maxT) maxT = v
        vbytes += Varint.zigzagLen(v)
        bloomSet(bloom, v)
        if (!overflow) {
          distinct += v
          if (distinct.size > DictCodec.MaxCard) overflow = true
        }
        var run = 1
        while (i + run < n && toks(i + run) == v) run += 1
        if (run > maxRun) maxRun = run
        runs += 1
        // stats for the run's remaining tokens (value already bloomed/counted)
        var j = 1
        while (j < run) { vbytes += Varint.zigzagLen(v); j += 1 }
        i += run
      }
      ri += 1
    }
    if (total == 0L) { minT = 0; maxT = 0 }
    val sorted = if (overflow) None else Some(distinct.toArray.sorted)
    ChunkStats(rows.length, total, minT, maxT, maxRun, runs, vbytes,
      sorted, if (overflow) DictCodec.MaxCard + 1L else distinct.size.toLong, bloom)
  }
}

/** Statistics-driven codec auto-selection (north_star). Cost-based: estimate
  * the encoded payload bytes of each eligible codec from the exact stats (plus
  * a bounded trial encode for FSST, whose ratio is data-dependent) and pick
  * the cheapest. Deterministic for a given chunk.
  */
object CodecSelector {
  val FsstTrialTokens = 4096

  final case class Choice(codec: ChunkCodec, header: Array[Byte], estBytes: Long)

  def choose(rows: IndexedSeq[Array[Int]], stats: ChunkStats): Choice = {
    val n = stats.totalTokens
    if (n == 0) return Choice(RawCodec, RawCodec.buildHeader(rows, stats), 0L)

    val rowOverhead = stats.rowCount.toLong * 2 // varint row prefixes, rough
    val candidates = mutable.ArrayBuffer.empty[(Long, ChunkCodec)]

    // raw: exact
    candidates += ((stats.varintBytes + rowOverhead, RawCodec))

    // rle: one (run varint + value varint) per run; sizes ~ avg varint len
    val avgVar = math.max(1L, stats.varintBytes / n)
    candidates += ((stats.numRuns * (1L + avgVar) + rowOverhead, RleCodec))

    // dict: header + width-bit indices
    stats.distinctSorted.foreach { dict =>
      val width = BitPack.bitsFor(dict.length - 1L)
      val hdr = dict.length.toLong * avgVar + 4
      candidates += ((hdr + (n * width + 7) / 8 + rowOverhead, DictCodec))
    }

    // FoR / bitpack: width from exact range
    val range = stats.maxTok.toLong - stats.minTok.toLong
    if (range >= 0) {
      val wFor = BitPack.bitsFor(range)
      candidates += (((n * wFor + 7) / 8 + rowOverhead + 6, ForCodec))
      if (stats.minTok >= 0) {
        val wBp = BitPack.bitsFor(stats.maxTok.toLong)
        candidates += (((n * wBp + 7) / 8 + rowOverhead + 6, BitPackCodec))
      }
    }

    // fsst: trial-train + trial-encode a bounded sample, extrapolate
    val fsstHeader = FsstTokenCodec.buildHeader(rows, stats)
    val trialEnc = FsstTokenCodec.encoder(fsstHeader)
    val out = new ByteWriter(8192)
    var trialTokens = 0L
    var ri = 0
    while (ri < rows.length && trialTokens < FsstTrialTokens) {
      trialEnc.encode(rows(ri), out)
      trialTokens += rows(ri).length
      ri += 1
    }
    if (trialTokens > 0) {
      val perTok = out.size.toDouble / trialTokens
      candidates += ((fsstHeader.length + (perTok * n).toLong, FsstTokenCodec))
    }

    // deterministic preference on ties: the candidate insertion order above
    val (estBytes, codec) = candidates.minBy(_._1)
    val header = if (codec eq FsstTokenCodec) fsstHeader else codec.buildHeader(rows, stats)
    Choice(codec, header, estBytes)
  }
}
