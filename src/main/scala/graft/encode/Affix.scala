package graft.encode

import graft.core._
import graft.format.{EncodedChunk, Offsets}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Compressed-domain SENTINEL INJECTION: prepend a BOS and/or append an EOS
  * token to every document directly over an encoded chunk table — the
  * add-special-tokens step of a training pipeline (document boundary markers
  * before packing/batching), the sixth write-side maintenance op after
  * [[Scrub]] / [[Scrub.remap]] / [[Truncate]] / [[Delete]] / [[Compact]].
  *
  * Every output row stays byte-identical to a fresh canonical encode of
  * `bos ++ tokens ++ eos` under the chunk's (possibly re-normalized) header
  * — the invariant equality pushdown (E5) memcmps against — at a cost far
  * below decode + re-encode:
  *
  *   1. RAW: pure splice — new varUInt(n), one prepended / appended zigzag
  *      varint, payload bytes copy untouched.
  *   2. RLE: run-domain edit — a sentinel equal to the first/last run's
  *      value extends that run (runs stay maximal = canonical), otherwise a
  *      length-1 run attaches; interior run bytes copy untouched.
  *   3. BITPACK / DICT / FoR: the packed plane re-packs per row (a prepend
  *      shifts every value by `width` bits, so a byte splice cannot apply).
  *      Bitpack widens the header width when the sentinel exceeds the old
  *      ceiling; dict inserts missing sentinels into the sorted dictionary
  *      (they now occur in EVERY row, so the union IS the canonical
  *      dictionary) and remaps old → new indices; FoR re-bases rows whose
  *      minimum the sentinel undercuts and widens the header width when a
  *      row's range grows past it.
  *   4. FSST — the interesting case. Out-of-vocabulary sentinels (the common
  *      case: special tokens get fresh ids beyond the text vocabulary) are a
  *      PURE BYTE SPLICE: if no symbol STARTS with bos, greedy must escape
  *      it, and position 0 is a boundary, so the whole old code stream
  *      follows verbatim; if no symbol CONTAINS eos, no match can span into
  *      the appended slot, so every old decision stands and escape(eos)
  *      attaches — adding sentinels to 100 TB of FSST chunks costs a memcpy
  *      and two escape bytes per row, zero decode, zero re-encode. In-vocab
  *      sentinels re-encode greedily from the perturbed end until the fresh
  *      code stream RESYNCS with an old symbol boundary (greedy longest-match
  *      is memoryless, so from a shared boundary position the canonical
  *      suffix equals the old bytes): the row decodes once (decode runs ~4×
  *      the encode rate), fresh encoding is bounded by the resync distance at
  *      the front and MaxSymbolLen-guarded window at the back, and the bytes
  *      between the two boundaries copy untouched.
  *
  * Rewritten chunks get exact recomputed stats (zone map, blooms, escape
  * census) and a fresh crc via [[Truncate.finishRows]]; ids, row order and
  * lineage are preserved.
  */
object Affix {

  /** Prepend `bos` and/or append `eos` to every row of an encoded chunk
    * table. Sentinels must be non-negative (vocabulary ids — and a negative
    * sentinel could force a codec change on bitpack chunks).
    */
  def affix(chunks: DataFrame, bos: Option[Int], eos: Option[Int]): Dataset[EncodedChunk] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val b = bos
    val e = eos
    chunks.as[EncodedChunk].map(c => affixChunk(c, b, e))
  }

  /** Affix one chunk. Returns the chunk unchanged when both sentinels are
    * absent or the chunk is empty.
    */
  def affixChunk(c: EncodedChunk, bos: Option[Int], eos: Option[Int]): EncodedChunk = {
    require(c.ver == graft.format.ChunkOps.FormatVersion,
      s"chunk ${c.chunk_id}: unsupported chunk format version ${c.ver}")
    require(bos.forall(_ >= 0) && eos.forall(_ >= 0),
      "sentinel tokens must be non-negative vocabulary ids")
    if ((bos.isEmpty && eos.isEmpty) || c.row_count == 0) return c
    val offs = Offsets.unpack(c.offsets, c.row_count)
    c.codec match {
      case FsstTokenCodec.name => affixFsst(c, offs, bos, eos)
      case RleCodec.name       => affixRle(c, offs, bos, eos)
      case DictCodec.name      => affixDict(c, offs, bos, eos)
      case ForCodec.name       => affixFor(c, offs, bos, eos)
      case BitPackCodec.name   => affixBitPack(c, offs, bos, eos)
      case RawCodec.name       => affixRaw(c, offs, bos, eos)
      case other =>
        throw new IllegalArgumentException(s"chunk ${c.chunk_id}: unknown codec $other")
    }
  }

  private def extra(bos: Option[Int], eos: Option[Int]): Int =
    (if (bos.isDefined) 1 else 0) + (if (eos.isDefined) 1 else 0)

  private def affixRaw(c: EncodedChunk, offs: Array[Int],
                       bos: Option[Int], eos: Option[Int]): EncodedChunk = {
    val add = extra(bos, eos)
    val out = new ByteWriter(c.data.length + c.row_count * (add * 5 + 1))
    val ends = new Array[Int](c.row_count)
    val rd = new ByteReader(c.data, 0, c.data.length)
    var row = 0
    while (row < c.row_count) {
      rd.pos = offs(row)
      val n = rd.readVarUInt()
      out.writeVarUInt(n + add)
      bos.foreach(out.writeZigZag)
      out.writeBytes(c.data, rd.pos, offs(row + 1) - rd.pos)
      eos.foreach(out.writeZigZag)
      ends(row) = out.size
      row += 1
    }
    Truncate.finishRows(c, c.symtab, out.toBytes, ends, c.doc_ids, c.first_doc_id)
  }

  private def affixRle(c: EncodedChunk, offs: Array[Int],
                       bos: Option[Int], eos: Option[Int]): EncodedChunk = {
    val add = extra(bos, eos)
    val out = new ByteWriter(c.data.length + c.row_count * (add * 6 + 1))
    val ends = new Array[Int](c.row_count)
    val rd = new ByteReader(c.data, 0, c.data.length)
    var row = 0
    while (row < c.row_count) {
      rd.pos = offs(row)
      val n = rd.readVarUInt()
      out.writeVarUInt(n + add)
      if (n == 0) {
        // runs of the sentinels alone; equal sentinels merge into one run
        (bos, eos) match {
          case (Some(b), Some(e)) if b == e => out.writeVarUInt(2); out.writeZigZag(b)
          case _ =>
            bos.foreach { b => out.writeVarUInt(1); out.writeZigZag(b) }
            eos.foreach { e => out.writeVarUInt(1); out.writeZigZag(e) }
        }
      } else {
        // walk the run headers: first run + byte offset of the last run
        val firstOff = rd.pos
        val firstRun = rd.readVarUInt()
        val firstVal = rd.readZigZag()
        val afterFirst = rd.pos
        var lastOff = firstOff
        var lastRun = firstRun
        var lastVal = firstVal
        var cnt = firstRun
        while (cnt < n) {
          lastOff = rd.pos
          lastRun = rd.readVarUInt()
          lastVal = rd.readZigZag()
          cnt += lastRun
        }
        if (lastOff == firstOff) {
          // single run: both sentinels edit the same run
          var r = firstRun
          var headDone = false
          bos.foreach { b =>
            if (b == firstVal) r += 1
            else { out.writeVarUInt(1); out.writeZigZag(b) }
          }
          eos.foreach { e =>
            if (e == firstVal) r += 1
            else {
              out.writeVarUInt(r); out.writeZigZag(firstVal); headDone = true
              out.writeVarUInt(1); out.writeZigZag(e)
            }
          }
          if (!headDone) { out.writeVarUInt(r); out.writeZigZag(firstVal) }
        } else {
          bos match {
            case Some(b) if b == firstVal =>
              out.writeVarUInt(firstRun + 1); out.writeZigZag(firstVal)
              out.writeBytes(c.data, afterFirst, lastOff - afterFirst)
            case Some(b) =>
              out.writeVarUInt(1); out.writeZigZag(b)
              out.writeBytes(c.data, firstOff, lastOff - firstOff)
            case None =>
              out.writeBytes(c.data, firstOff, lastOff - firstOff)
          }
          eos match {
            case Some(e) if e == lastVal =>
              out.writeVarUInt(lastRun + 1); out.writeZigZag(lastVal)
            case Some(e) =>
              out.writeBytes(c.data, lastOff, offs(row + 1) - lastOff)
              out.writeVarUInt(1); out.writeZigZag(e)
            case None =>
              out.writeBytes(c.data, lastOff, offs(row + 1) - lastOff)
          }
        }
      }
      ends(row) = out.size
      row += 1
    }
    Truncate.finishRows(c, c.symtab, out.toBytes, ends, c.doc_ids, c.first_doc_id)
  }

  private def affixBitPack(c: EncodedChunk, offs: Array[Int],
                           bos: Option[Int], eos: Option[Int]): EncodedChunk = {
    val oldW = c.symtab(0) & 0xff
    val newW = math.max(oldW,
      math.max(bos.map(b => BitPack.bitsFor(b)).getOrElse(0),
        eos.map(e => BitPack.bitsFor(e)).getOrElse(0)))
    val header = if (newW == oldW) c.symtab else Array[Byte](newW.toByte)
    val add = extra(bos, eos)
    val out = new ByteWriter(c.data.length * 2 + 16)
    val ends = new Array[Int](c.row_count)
    val rd = new ByteReader(c.data, 0, c.data.length)
    var row = 0
    while (row < c.row_count) {
      rd.pos = offs(row)
      val n = rd.readVarUInt()
      val vals = new Array[Int](n + add)
      var k = 0
      bos.foreach { b => vals(k) = b; k += 1 }
      if (n > 0) {
        val old = BitPack.unpack(c.data, rd.pos, n, oldW, v => v)
        System.arraycopy(old, 0, vals, k, n)
        k += n
      }
      eos.foreach { e => vals(k) = e; k += 1 }
      out.writeVarUInt(vals.length)
      BitPack.pack(vals, 0, vals.length, v => v, newW, out)
      ends(row) = out.size
      row += 1
    }
    Truncate.finishRows(c, header, out.toBytes, ends, c.doc_ids, c.first_doc_id)
  }

  private def affixFor(c: EncodedChunk, offs: Array[Int],
                       bos: Option[Int], eos: Option[Int]): EncodedChunk = {
    val oldW = c.symtab(0) & 0xff
    val rd = new ByteReader(c.data, 0, c.data.length)
    // pass 1: the width the widest affixed row needs (range as a LONG —
    // at width 32 a delta read back as Int wraps negative)
    var needW = oldW
    var row = 0
    while (row < c.row_count) {
      rd.pos = offs(row)
      val n = rd.readVarUInt()
      var minV = Int.MaxValue
      var maxV = Int.MinValue
      if (n > 0) {
        val base = rd.readZigZag()
        minV = base
        maxV = base
        if (oldW > 0) {
          val deltas = BitPack.unpack(c.data, rd.pos, n, oldW, d => d)
          var j = 0
          while (j < n) {
            val v = base + deltas(j)
            if (v < minV) minV = v
            if (v > maxV) maxV = v
            j += 1
          }
        }
      }
      bos.foreach { b => if (b < minV) minV = b; if (b > maxV) maxV = b }
      eos.foreach { e => if (e < minV) minV = e; if (e > maxV) maxV = e }
      val range = maxV.toLong - minV.toLong
      val w = 64 - java.lang.Long.numberOfLeadingZeros(range)
      if (w > needW) needW = w
      row += 1
    }
    val header = if (needW == oldW) c.symtab else Array[Byte](needW.toByte)
    val add = extra(bos, eos)
    val out = new ByteWriter(c.data.length * 2 + 16)
    val ends = new Array[Int](c.row_count)
    row = 0
    while (row < c.row_count) {
      rd.pos = offs(row)
      val n = rd.readVarUInt()
      val vals = new Array[Int](n + add)
      var k = 0
      bos.foreach { b => vals(k) = b; k += 1 }
      if (n > 0) {
        val base = rd.readZigZag()
        if (oldW == 0) {
          var j = 0
          while (j < n) { vals(k + j) = base; j += 1 }
        } else {
          val deltas = BitPack.unpack(c.data, rd.pos, n, oldW, d => d)
          var j = 0
          while (j < n) { vals(k + j) = base + deltas(j); j += 1 }
        }
        k += n
      }
      eos.foreach { e => vals(k) = e; k += 1 }
      // canonical FoR row: varUInt(n) + zigzag(row min) + deltas at width
      out.writeVarUInt(vals.length)
      var nb = vals(0)
      var j = 1
      while (j < vals.length) { if (vals(j) < nb) nb = vals(j); j += 1 }
      out.writeZigZag(nb)
      val b0 = nb
      BitPack.pack(vals, 0, vals.length, v => v - b0, needW, out)
      ends(row) = out.size
      row += 1
    }
    Truncate.finishRows(c, header, out.toBytes, ends, c.doc_ids, c.first_doc_id)
  }

  private def affixDict(c: EncodedChunk, offs: Array[Int],
                        bos: Option[Int], eos: Option[Int]): EncodedChunk = {
    val dict = DictCodec.readDict(c.symtab)
    val oldW = BitPack.bitsFor(math.max(dict.length - 1, 0))
    // sentinels now occur in every row, so the canonical dictionary is the
    // sorted union of the old dictionary and the missing sentinels
    val missing = (bos.toSeq ++ eos.toSeq).distinct.filter(t =>
      java.util.Arrays.binarySearch(dict, t) < 0).sorted
    val (newDict, idxMap) =
      if (missing.isEmpty) (dict, null: Array[Int])
      else {
        val nd = (dict ++ missing).sorted
        val m = new Array[Int](dict.length)
        var j = 0
        while (j < dict.length) {
          m(j) = java.util.Arrays.binarySearch(nd, dict(j))
          j += 1
        }
        (nd, m)
      }
    val newW = BitPack.bitsFor(math.max(newDict.length - 1, 0))
    val header =
      if (missing.isEmpty) c.symtab
      else {
        val w = new ByteWriter(newDict.length * 2 + 8)
        w.writeVarUInt(newDict.length)
        var j = 0
        while (j < newDict.length) { w.writeZigZag(newDict(j)); j += 1 }
        w.toBytes
      }
    val bosIdx = bos.map(b => java.util.Arrays.binarySearch(newDict, b))
    val eosIdx = eos.map(e => java.util.Arrays.binarySearch(newDict, e))
    val add = extra(bos, eos)
    val out = new ByteWriter(c.data.length * 2 + 16)
    val ends = new Array[Int](c.row_count)
    val rd = new ByteReader(c.data, 0, c.data.length)
    var row = 0
    while (row < c.row_count) {
      rd.pos = offs(row)
      val n = rd.readVarUInt()
      val idx = new Array[Int](n + add)
      var k = 0
      bosIdx.foreach { b => idx(k) = b; k += 1 }
      if (n > 0) {
        val old = BitPack.unpack(c.data, rd.pos, n, oldW,
          i => if (idxMap == null) i else idxMap(i))
        System.arraycopy(old, 0, idx, k, n)
        k += n
      }
      eosIdx.foreach { e => idx(k) = e; k += 1 }
      out.writeVarUInt(idx.length)
      BitPack.pack(idx, 0, idx.length, i => i, newW, out)
      ends(row) = out.size
      row += 1
    }
    Truncate.finishRows(c, header, out.toBytes, ends, c.doc_ids, c.first_doc_id)
  }

  private def affixFsst(c: EncodedChunk, offs: Array[Int],
                        bos: Option[Int], eos: Option[Int]): EncodedChunk = {
    val st = SymTab.fromBytes(c.symtab)
    val nSyms = st.lens.length
    // chunk-level fast-path predicates: if no symbol STARTS with bos, greedy
    // must escape it at position 0 (a boundary), so the old stream follows
    // verbatim; if no symbol CONTAINS eos, no match can span into the
    // appended slot, so every old decision stands and escape(eos) attaches
    def startsWith(t: Int): Boolean = {
      var cd = 0
      while (cd < nSyms) {
        if (st.flatTokens(st.flatOffsets(cd)) == t) return true
        cd += 1
      }
      false
    }
    def contains(t: Int): Boolean = {
      val flat = st.flatTokens
      var j = 0
      while (j < flat.length) {
        if (flat(j) == t) return true
        j += 1
      }
      false
    }
    val bosFast = bos.forall(b => !startsWith(b))
    val eosFast = eos.forall(e => !contains(e))
    val add = extra(bos, eos)
    val out = new ByteWriter(c.data.length + c.row_count * (add * 6 + 1))
    val ends = new Array[Int](c.row_count)
    val dec = if (bosFast && eosFast) null else FsstTokenCodec.decoder(c.symtab)
    var row = 0
    while (row < c.row_count) {
      val from = offs(row)
      val to = offs(row + 1)
      var pos = from
      var n = 0
      var shift = 0
      var b0 = 0
      do {
        b0 = c.data(pos) & 0xff; pos += 1
        n |= (b0 & 0x7f) << shift; shift += 7
      } while ((b0 & 0x80) != 0)
      out.writeVarUInt(n + add)
      if (bosFast && eosFast) {
        bos.foreach { b => out.writeByte(SymTab.EscapeCode); out.writeZigZag(b) }
        out.writeBytes(c.data, pos, to - pos)
        eos.foreach { e => out.writeByte(SymTab.EscapeCode); out.writeZigZag(e) }
      } else {
        // general path: decode once (decode runs ~4× the encode rate), walk
        // the old symbol boundaries, fresh-encode from the perturbed front
        // until the code stream resyncs with an old boundary, splice the
        // untouched middle, fresh-encode the MaxSymbolLen-guarded back
        val toks = dec.decode(c.data, from, to)
        val bosOff = if (bos.isDefined) 1 else 0
        val uLen = n + add
        val u = new Array[Int](uLen)
        bos.foreach(b => u(0) = b)
        System.arraycopy(toks, 0, u, bosOff, n)
        eos.foreach(e => u(uLen - 1) = e)
        // old boundaries: token position -> byte offset (strictly increasing)
        val bndPos = new Array[Int](n + 1)
        val bndOff = new Array[Int](n + 1)
        var nb = 0
        var q = 0
        var p2 = pos
        while (p2 < to) {
          bndPos(nb) = q; bndOff(nb) = p2; nb += 1
          val cb = c.data(p2) & 0xff
          if (cb == SymTab.EscapeCode) {
            p2 += 1
            while ((c.data(p2) & 0x80) != 0) p2 += 1
            p2 += 1
            q += 1
          } else { p2 += 1; q += st.symLen(cb) }
        }
        bndPos(nb) = n; bndOff(nb) = to; nb += 1
        // the last boundary whose suffix decisions the appended eos cannot
        // change (window guard: decisions at p need p + MaxSymbolLen <= n)
        val tailGuard = if (eos.isDefined) n - SymTab.MaxSymbolLen else n
        var qTailIdx = -1
        var bi = 0
        while (bi < nb && bndPos(bi) <= tailGuard) { qTailIdx = bi; bi += 1 }
        var p = 0
        var spliced = qTailIdx < 0 // no splice window: fully fresh encode
        while (p < uLen) {
          val oq = p - bosOff
          val qi =
            if (!spliced && oq >= 0 && oq <= bndPos(qTailIdx))
              java.util.Arrays.binarySearch(bndPos, 0, nb, oq)
            else -1
          if (qi >= 0) {
            out.writeBytes(c.data, bndOff(qi), bndOff(qTailIdx) - bndOff(qi))
            p = bosOff + bndPos(qTailIdx)
            spliced = true
          } else {
            val code = st.longestMatch(u, p, uLen)
            if (code >= 0) { out.writeByte(code); p += st.symLen(code) }
            else {
              out.writeByte(SymTab.EscapeCode)
              out.writeZigZag(u(p))
              p += 1
            }
          }
        }
      }
      ends(row) = out.size
      row += 1
    }
    Truncate.finishRows(c, c.symtab, out.toBytes, ends, c.doc_ids, c.first_doc_id)
  }
}
