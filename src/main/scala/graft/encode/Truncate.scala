package graft.encode

import graft.core._
import graft.format.{ChunkOps, ChunkStatsRow, EncodedChunk, Offsets}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Compressed-domain sequence TRUNCATION: cap every document at `maxLen`
  * tokens directly over an encoded chunk table — the max-seq-len enforcement
  * step of a training pipeline (context-window cutoff), the third write-side
  * maintenance op after [[Scrub]] (redaction) and [[Compact]] (small files).
  *
  * Every codec's row payload is a PREFIX-STRUCTURED stream (varUInt(n) +
  * tokens in order), so a head cut never needs a decode:
  *
  *   1. GATE: rows at or under `maxLen` — read from the uniform varUInt row
  *      prefix at metadata cost — splice through byte-identical; a chunk with
  *      no long rows passes through untouched (same crc). Truncation is
  *      priced by the long-row fraction, not the corpus size.
  *   2. RAW: copy the first `maxLen` zigzag varints (cursor scan, no decode).
  *   3. RLE: cut in the run domain — emit whole runs until the budget, clip
  *      the last run. Runs stay maximal (adjacent values stay distinct), so
  *      the output is exactly a fresh canonical encode of the truncated row.
  *   4. BITPACK: copy ceil(maxLen·width/8) payload bytes and zero the bits
  *      of the final byte above maxLen·width — precisely the residue
  *      [[BitPack.pack]] leaves, so the splice is bit-identical to re-pack.
  *   5. FoR: bases are per-row minima, so a cut can RAISE the base (the old
  *      minimum may live beyond the cut). If the first `maxLen` deltas still
  *      touch 0 the row splices like bitpack; otherwise deltas re-pack
  *      against the new base at the unchanged header width — matching what
  *      `ForCodec.encoder(header)` emits for the truncated row.
  *   6. DICT: indices splice like bitpack. If the cut strands dictionary
  *      entries (a token's only occurrences were beyond `maxLen`), the
  *      dictionary re-normalizes (sorted distinct set of the SURVIVING
  *      tokens — the invariant every dict-domain matcher binary-searches on)
  *      and rows re-pack old-index → new-index at the new width, same as
  *      [[Scrub]]'s dict path.
  *   7. FSST: greedy longest-match is left-to-right and memoryless, so the
  *      code stream of the truncated row EQUALS the original code stream up
  *      to the first symbol that crosses the cut (any earlier symbol ends
  *      inside the kept prefix, and no longer match could have existed or
  *      greedy would have taken it). The splice copies codes up to that
  *      boundary and greedily re-encodes only the crossing symbol's kept
  *      expansion (≤ 7 tokens) — byte-identical to a fresh canonical encode
  *      under the chunk's table, which is the invariant equality pushdown
  *      (E5) memcmps against. Escapes copy as-is (one token each).
  *
  * The codec and header never change except the dict re-normalization, so
  * every compressed-domain matcher keeps working on the truncated table.
  * Rewritten chunks get exact recomputed stats (zone map, blooms, max run,
  * distinct, escape census) via [[ChunkWalker]] and a fresh crc.
  */
object Truncate {

  /** Truncate every row of an encoded chunk table to at most `maxLen`
    * tokens; ids, row order, row counts and chunk/bucket lineage are
    * preserved.
    */
  def truncate(chunks: DataFrame, maxLen: Int): Dataset[EncodedChunk] = {
    require(maxLen >= 0, s"maxLen must be non-negative, got $maxLen")
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.as[EncodedChunk].map(c => truncateChunk(c, maxLen))
  }

  /** Truncate one chunk. Returns the chunk UNCHANGED (same object, same crc)
    * when no row exceeds `maxLen`.
    */
  def truncateChunk(c: EncodedChunk, maxLen: Int): EncodedChunk = {
    require(c.ver == ChunkOps.FormatVersion,
      s"chunk ${c.chunk_id}: unsupported chunk format version ${c.ver}")
    require(maxLen >= 0, s"maxLen must be non-negative, got $maxLen")
    val offs = Offsets.unpack(c.offsets, c.row_count)
    val rd = new ByteReader(c.data, 0, c.data.length)
    var dirty = false
    var i = 0
    while (i < c.row_count && !dirty) {
      rd.pos = offs(i)
      if (rd.readVarUInt() > maxLen) dirty = true
      i += 1
    }
    if (!dirty) return c
    c.codec match {
      case FsstTokenCodec.name => truncFsst(c, offs, maxLen)
      case RleCodec.name       => truncRle(c, offs, maxLen)
      case DictCodec.name      => truncDict(c, offs, maxLen)
      case ForCodec.name       => truncFor(c, offs, maxLen)
      case BitPackCodec.name   => truncBitPack(c, offs, maxLen)
      case RawCodec.name       => truncRaw(c, offs, maxLen)
      case other =>
        throw new IllegalArgumentException(s"chunk ${c.chunk_id}: unknown codec $other")
    }
  }

  /** Splice n values of a width-bit packed payload starting at data(pos):
    * whole bytes copy, the final partial byte zeroes its unused high bits —
    * exactly the residue a fresh [[BitPack.pack]] leaves there.
    */
  private def splicePacked(data: Array[Byte], pos: Int, n: Int, width: Int,
                           out: ByteWriter): Unit = {
    val bits = n.toLong * width
    val nBytes = ((bits + 7) >>> 3).toInt
    val rem = (bits & 7L).toInt
    if (nBytes == 0) return
    if (rem == 0) out.writeBytes(data, pos, nBytes)
    else {
      out.writeBytes(data, pos, nBytes - 1)
      out.writeByte(data(pos + nBytes - 1) & ((1 << rem) - 1))
    }
  }

  private def truncRaw(c: EncodedChunk, offs: Array[Int], maxLen: Int): EncodedChunk = {
    val out = new ByteWriter(c.data.length)
    val ends = new Array[Int](c.row_count)
    val rd = new ByteReader(c.data, 0, c.data.length)
    var row = 0
    while (row < c.row_count) {
      rd.pos = offs(row)
      val n = rd.readVarUInt()
      if (n <= maxLen) out.writeBytes(c.data, offs(row), offs(row + 1) - offs(row))
      else {
        out.writeVarUInt(maxLen)
        val start = rd.pos
        var k = 0
        while (k < maxLen) { rd.readVarUInt(); k += 1 } // zigzag varints scan the same
        out.writeBytes(c.data, start, rd.pos - start)
      }
      ends(row) = out.size
      row += 1
    }
    finish(c, c.symtab, out.toBytes, ends)
  }

  private def truncRle(c: EncodedChunk, offs: Array[Int], maxLen: Int): EncodedChunk = {
    val out = new ByteWriter(c.data.length)
    val ends = new Array[Int](c.row_count)
    val rd = new ByteReader(c.data, 0, c.data.length)
    var row = 0
    while (row < c.row_count) {
      rd.pos = offs(row)
      val n = rd.readVarUInt()
      if (n <= maxLen) out.writeBytes(c.data, offs(row), offs(row + 1) - offs(row))
      else {
        out.writeVarUInt(maxLen)
        var emitted = 0
        while (emitted < maxLen) {
          val run = rd.readVarUInt()
          val v = rd.readZigZag()
          val take = math.min(run, maxLen - emitted)
          out.writeVarUInt(take)
          out.writeZigZag(v)
          emitted += take
        }
      }
      ends(row) = out.size
      row += 1
    }
    finish(c, c.symtab, out.toBytes, ends)
  }

  private def truncBitPack(c: EncodedChunk, offs: Array[Int], maxLen: Int): EncodedChunk = {
    val width = c.symtab(0) & 0xff
    val out = new ByteWriter(c.data.length)
    val ends = new Array[Int](c.row_count)
    val rd = new ByteReader(c.data, 0, c.data.length)
    var row = 0
    while (row < c.row_count) {
      rd.pos = offs(row)
      val n = rd.readVarUInt()
      if (n <= maxLen) out.writeBytes(c.data, offs(row), offs(row + 1) - offs(row))
      else {
        out.writeVarUInt(maxLen)
        splicePacked(c.data, rd.pos, maxLen, width, out)
      }
      ends(row) = out.size
      row += 1
    }
    finish(c, c.symtab, out.toBytes, ends)
  }

  private def truncFor(c: EncodedChunk, offs: Array[Int], maxLen: Int): EncodedChunk = {
    val width = c.symtab(0) & 0xff
    val out = new ByteWriter(c.data.length)
    val ends = new Array[Int](c.row_count)
    val rd = new ByteReader(c.data, 0, c.data.length)
    var row = 0
    while (row < c.row_count) {
      rd.pos = offs(row)
      val n = rd.readVarUInt()
      if (n <= maxLen) out.writeBytes(c.data, offs(row), offs(row + 1) - offs(row))
      else if (maxLen == 0) out.writeVarUInt(0)
      else {
        val base = rd.readZigZag()
        if (width == 0) { // constant row: all values equal the base
          out.writeVarUInt(maxLen)
          out.writeZigZag(base)
        } else {
          val deltas = BitPack.unpack(c.data, rd.pos, maxLen, width, d => d)
          // the new base is the min VALUE of the kept prefix: reconstruct
          // values as base + delta (Int add wraps correctly mod 2^32 — at
          // width 32 a delta read back as Int can be negative, so taking a
          // signed min over raw deltas would pick the wrong row minimum)
          var minV = base + deltas(0)
          var j = 1
          while (j < maxLen) {
            val v = base + deltas(j)
            if (v < minV) minV = v
            j += 1
          }
          out.writeVarUInt(maxLen)
          if (minV == base) { // base survives the cut: pure byte splice
            out.writeZigZag(base)
            splicePacked(c.data, rd.pos, maxLen, width, out)
          } else { // the row minimum was beyond the cut: re-base
            out.writeZigZag(minV)
            val b = base
            val m = minV
            BitPack.pack(deltas, 0, maxLen, d => b + d - m, width, out)
          }
        }
      }
      ends(row) = out.size
      row += 1
    }
    finish(c, c.symtab, out.toBytes, ends)
  }

  private def truncDict(c: EncodedChunk, offs: Array[Int], maxLen: Int): EncodedChunk = {
    val dict = DictCodec.readDict(c.symtab)
    val oldW = BitPack.bitsFor(math.max(dict.length - 1, 0))
    val rd = new ByteReader(c.data, 0, c.data.length)
    // pass 1: which dictionary entries survive the cut?
    val used = new Array[Boolean](dict.length)
    var usedCnt = 0
    var row = 0
    while (row < c.row_count) {
      rd.pos = offs(row)
      val keep = math.min(rd.readVarUInt(), maxLen)
      if (keep > 0) {
        val idx = BitPack.unpack(c.data, rd.pos, keep, oldW, i => i)
        var j = 0
        while (j < keep) {
          val k = idx(j)
          if (!used(k)) { used(k) = true; usedCnt += 1 }
          j += 1
        }
      }
      row += 1
    }
    val out = new ByteWriter(c.data.length)
    val ends = new Array[Int](c.row_count)
    if (usedCnt == dict.length) {
      // dictionary intact: rows splice in the index domain
      row = 0
      while (row < c.row_count) {
        rd.pos = offs(row)
        val n = rd.readVarUInt()
        if (n <= maxLen) out.writeBytes(c.data, offs(row), offs(row + 1) - offs(row))
        else {
          out.writeVarUInt(maxLen)
          splicePacked(c.data, rd.pos, maxLen, oldW, out)
        }
        ends(row) = out.size
        row += 1
      }
      finish(c, c.symtab, out.toBytes, ends)
    } else {
      // stranded entries: re-normalize (a sorted subset stays sorted) and
      // re-pack every row old-index → new-index at the new width
      val idxMap = new Array[Int](dict.length)
      val newDict = new Array[Int](usedCnt)
      var k = 0
      var iD = 0
      while (iD < dict.length) {
        if (used(iD)) { idxMap(iD) = k; newDict(k) = dict(iD); k += 1 }
        iD += 1
      }
      val newW = BitPack.bitsFor(math.max(usedCnt - 1, 0))
      val header = {
        val w = new ByteWriter(usedCnt * 2 + 8)
        w.writeVarUInt(usedCnt)
        var j = 0
        while (j < usedCnt) { w.writeZigZag(newDict(j)); j += 1 }
        w.toBytes
      }
      row = 0
      while (row < c.row_count) {
        rd.pos = offs(row)
        val keep = math.min(rd.readVarUInt(), maxLen)
        out.writeVarUInt(keep)
        if (keep > 0) {
          val idx = BitPack.unpack(c.data, rd.pos, keep, oldW, i => idxMap(i))
          BitPack.pack(idx, 0, keep, j => j, newW, out)
        }
        ends(row) = out.size
        row += 1
      }
      finish(c, header, out.toBytes, ends)
    }
  }

  private def truncFsst(c: EncodedChunk, offs: Array[Int], maxLen: Int): EncodedChunk = {
    val st = SymTab.fromBytes(c.symtab)
    val out = new ByteWriter(c.data.length)
    val ends = new Array[Int](c.row_count)
    val rd = new ByteReader(c.data, 0, c.data.length)
    var row = 0
    while (row < c.row_count) {
      rd.pos = offs(row)
      val n = rd.readVarUInt()
      if (n <= maxLen) out.writeBytes(c.data, offs(row), offs(row + 1) - offs(row))
      else {
        out.writeVarUInt(maxLen)
        var pos = rd.pos
        val copyStart = pos
        var k = 0
        var crossing = -1 // code of the first symbol that crosses the cut
        while (k < maxLen && crossing < 0) {
          val b = c.data(pos) & 0xff
          if (b == SymTab.EscapeCode) {
            // escape = exactly one token: marker byte + zigzag varint
            pos += 1
            while ((c.data(pos) & 0x80) != 0) pos += 1
            pos += 1
            k += 1
          } else {
            val len = st.symLen(b)
            if (k + len <= maxLen) { pos += 1; k += len }
            else crossing = b
          }
        }
        out.writeBytes(c.data, copyStart, pos - copyStart)
        if (crossing >= 0) {
          // greedy re-encode of the crossing symbol's kept expansion (< 8
          // tokens) — from here on this IS the canonical encode of the
          // truncated row (greedy is memoryless)
          val sym = st.symbol(crossing)
          val rem = maxLen - k
          var j = 0
          while (j < rem) {
            val code = st.longestMatch(sym, j, rem)
            if (code >= 0) { out.writeByte(code); j += st.symLen(code) }
            else {
              out.writeByte(SymTab.EscapeCode)
              out.writeZigZag(sym(j))
              j += 1
            }
          }
        }
      }
      ends(row) = out.size
      row += 1
    }
    finish(c, c.symtab, out.toBytes, ends)
  }

  /** Exact stats + escape census + crc for a rewritten chunk. */
  private def finish(c: EncodedChunk, header: Array[Byte], data: Array[Byte],
                     ends: Array[Int]): EncodedChunk =
    finishRows(c, header, data, ends, c.doc_ids, c.first_doc_id)

  /** Shared rewrite epilogue ([[Truncate]], [[Delete]]): exact stats +
    * escape census via [[ChunkWalker]], fresh crc, with the row population
    * (and so the id slab / row count) possibly changed — `ends.length` is
    * the new row count.
    */
  private[encode] def finishRows(c: EncodedChunk, header: Array[Byte], data: Array[Byte],
                                 ends: Array[Int], idsPacked: Array[Byte],
                                 firstDocId: String): EncodedChunk = {
    val rowCount = ends.length
    val offs = new Array[Int](ends.length + 1)
    System.arraycopy(ends, 0, offs, 1, ends.length)
    val acc = new Scrub.StatsAcc
    var total = 0L
    val sink = new TokenSink {
      def rowStart(row: Int, n: Int): Unit = { total += n }
      def feed(t: Int): Unit = acc.run(t, 1)
      override def feedRun(t: Int, r: Int): Unit = acc.run(t, r)
      def rowEnd(row: Int): Unit = acc.endRow()
    }
    ChunkWalker.walk(c.codec, header, data, offs, rowCount, sink)
    val (escCnt, escBloom) =
      if (c.codec == FsstTokenCodec.name) fsstEscapeStats(data, offs, rowCount)
      else (0L, acc.bloom)
    val offsets = Offsets.pack(ends)
    c.copy(
      symtab = header,
      data = data,
      offsets = offsets,
      row_count = rowCount,
      n_tokens = total,
      first_doc_id = firstDocId,
      doc_ids = idsPacked,
      stats = ChunkStatsRow(acc.distinct,
        if (acc.minTok == Int.MaxValue) 0 else acc.minTok,
        if (acc.maxTok == Int.MinValue) 0 else acc.maxTok,
        acc.maxRun, escCnt, acc.bloom, escBloom),
      crc = ChunkOps.chunkCrc(data, header, offsets, idsPacked))
  }

  /** Escape census over an FSST chunk's code stream: count + bloom of tokens
    * stored as escapes (the row-level skip gate input). Payload bytes of an
    * escape are parsed past, so a 0xFF inside a varint is never misread as a
    * marker — same walk as the decoder.
    */
  private def fsstEscapeStats(data: Array[Byte], offs: Array[Int],
                              rowCount: Int): (Long, Array[Byte]) = {
    val bloom = new Array[Byte](ChunkStats.BloomBytes)
    var esc = 0L
    var row = 0
    while (row < rowCount) {
      var pos = offs(row)
      val to = offs(row + 1)
      while ((data(pos) & 0x80) != 0) pos += 1 // skip varUInt(n)
      pos += 1
      while (pos < to) {
        pos = Swar.indexOfFF(data, pos, to)
        if (pos < to) {
          pos += 1
          var u = 0
          var sh = 0
          var b = 0
          do {
            b = data(pos) & 0xff; pos += 1
            u |= (b & 0x7f) << sh; sh += 7
          } while ((b & 0x80) != 0)
          ChunkStats.bloomSet(bloom, (u >>> 1) ^ -(u & 1))
          esc += 1
        }
      }
      row += 1
    }
    (esc, bloom)
  }
}
