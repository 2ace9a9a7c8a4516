package graft.core

import scala.collection.mutable

/** Compressed-domain token-frequency counting: per-codec kernels that build
  * a chunk-local (token → count) histogram WITHOUT materializing any decoded
  * row. This is the aggregation analog of the compressed-domain predicates
  * (the reference's research question is predicates-on-codes; frequency
  * counting extends the same trick to GROUP BY token):
  *
  *  - fsst:    count CODE BYTES (one counter bump per byte, SWAR-segmented
  *             past escapes), then expand once per chunk: a code's count
  *             contributes to each token of its symbol. Work is O(code bytes)
  *             + O(256 · maxSymLen), not O(tokens) — on text-like data codes
  *             average >1 token so this touches ~half the positions decode
  *             would, and no output array is ever allocated.
  *  - rle:     one bump of `run` per run — repeated tokens are never touched
  *             individually (the asymptotic win on run-heavy sources).
  *  - dict:    count bit-packed INDICES into a card-sized dense array, map
  *             through the dictionary once at the end.
  *  - bitpack/for/raw: count packed/varint values straight off the wire.
  *
  * The chunk's zone map (min/max token) sizes a dense counting array when the
  * token range is small; otherwise a hash accumulator. Downstream the per-
  * chunk histograms merge under Spark's partial aggregation, so the shuffle
  * moves at most |vocab ∩ partition| rows per map task — at 100 TB the
  * reduce input is bounded by vocabulary size × shuffle partitions, not by
  * corpus size.
  */
object CountMatch {

  /** Dense when the zone-mapped token range is small (≤2M slots = 16 MB of
    * longs, transient per chunk eval); hash otherwise. Chunks cap at 512Ki
    * tokens so the dense path covers every realistic vocab-id layout.
    */
  final class TokenCounter(minTok: Int, maxTok: Int) {
    private val span: Long = maxTok.toLong - minTok.toLong + 1L
    private val dense: Array[Long] =
      if (span > 0 && span <= (1L << 21)) new Array[Long](span.toInt) else null
    private val sparse: mutable.LongMap[Long] =
      if (dense == null) mutable.LongMap.empty[Long] else null

    def add(tok: Int, c: Long): Unit =
      if (dense != null) dense(tok - minTok) += c
      else {
        val k = tok.toLong
        sparse.update(k, sparse.getOrElse(k, 0L) + c)
      }

    /** (tokens, counts) with counts > 0, tokens ascending (deterministic). */
    def result(): (Array[Int], Array[Long]) = {
      if (dense != null) {
        var nz = 0
        var i = 0
        while (i < dense.length) { if (dense(i) != 0L) nz += 1; i += 1 }
        val toks = new Array[Int](nz)
        val cnts = new Array[Long](nz)
        var k = 0
        i = 0
        while (i < dense.length) {
          if (dense(i) != 0L) { toks(k) = minTok + i; cnts(k) = dense(i); k += 1 }
          i += 1
        }
        (toks, cnts)
      } else {
        val keys = sparse.keys.toArray
        java.util.Arrays.sort(keys)
        val toks = new Array[Int](keys.length)
        val cnts = new Array[Long](keys.length)
        var i = 0
        while (i < keys.length) { toks(i) = keys(i).toInt; cnts(i) = sparse(keys(i)); i += 1 }
        (toks, cnts)
      }
    }
  }

  /** Histogram of one whole chunk, dispatched per codec. `offs` has
    * rowCount+1 entries (see Offsets.unpack).
    */
  def chunkCounts(codec: String, header: Array[Byte], data: Array[Byte],
                  offs: Array[Int], rowCount: Int,
                  minTok: Int, maxTok: Int): (Array[Int], Array[Long]) = {
    val counter = new TokenCounter(minTok, maxTok)
    codec match {
      case FsstTokenCodec.name => countFsst(SymTab.fromBytes(header), data, offs, rowCount, counter)
      case DictCodec.name      => countDict(header, data, offs, rowCount, counter)
      case RleCodec.name       => countRle(data, offs, rowCount, counter)
      case BitPackCodec.name   => countBitpack(data, offs, rowCount, header(0) & 0xff, counter)
      case ForCodec.name       => countFor(data, offs, rowCount, header(0) & 0xff, counter)
      case RawCodec.name       => countRaw(data, offs, rowCount, counter)
      case other =>
        val dec = Codecs.byName(other).decoder(header)
        var i = 0
        while (i < rowCount) {
          val row = dec.decode(data, offs(i), offs(i + 1))
          var j = 0
          while (j < row.length) { counter.add(row(j), 1L); j += 1 }
          i += 1
        }
    }
    counter.result()
  }

  /** FSST: per-chunk code histogram (SWAR-segmented, branch-free past
    * escapes), escapes counted directly, then one code→tokens expansion.
    */
  private def countFsst(st: SymTab, data: Array[Byte], offs: Array[Int],
                        rowCount: Int, counter: TokenCounter): Unit = {
    val codeCnt = new Array[Long](256)
    var i = 0
    while (i < rowCount) {
      var pos = offs(i)
      val to = offs(i + 1)
      // skip the varUInt(n) row prefix
      while ((data(pos) & 0x80) != 0) pos += 1
      pos += 1
      while (pos < to) {
        val seg = Swar.indexOfFF(data, pos, to)
        while (pos < seg) { codeCnt(data(pos) & 0xff) += 1L; pos += 1 }
        if (pos < to) {
          pos += 1 // escape marker
          var u = 0
          var sh = 0
          var b = 0
          do {
            b = data(pos) & 0xff; pos += 1
            u |= (b & 0x7f) << sh; sh += 7
          } while ((b & 0x80) != 0)
          counter.add((u >>> 1) ^ -(u & 1), 1L)
        }
      }
      i += 1
    }
    val flat = st.flatTokens
    val flatOff = st.flatOffsets
    var c = 0
    while (c < 255) {
      val n = codeCnt(c)
      if (n != 0L) {
        var j = flatOff(c)
        val e = flatOff(c + 1)
        while (j < e) { counter.add(flat(j), n); j += 1 }
      }
      c += 1
    }
  }

  private def countDict(header: Array[Byte], data: Array[Byte], offs: Array[Int],
                        rowCount: Int, counter: TokenCounter): Unit = {
    val dict = DictCodec.readDict(header)
    val width = BitPack.bitsFor(math.max(dict.length - 1, 0))
    val idxCnt = new Array[Long](math.max(dict.length, 1))
    var i = 0
    while (i < rowCount) {
      val r = new ByteReader(data, offs(i), offs(i + 1))
      val n = r.readVarUInt()
      if (width == 0) idxCnt(0) += n
      else {
        var acc = 0L
        var nbits = 0
        var pos = r.pos
        val mask = if (width == 32) 0xffffffffL else (1L << width) - 1
        var k = 0
        while (k < n) {
          while (nbits < width) { acc |= (data(pos) & 0xffL) << nbits; pos += 1; nbits += 8 }
          idxCnt((acc & mask).toInt) += 1L
          acc >>>= width
          nbits -= width
          k += 1
        }
      }
      i += 1
    }
    var d = 0
    while (d < dict.length) {
      if (idxCnt(d) != 0L) counter.add(dict(d), idxCnt(d))
      d += 1
    }
  }

  private def countRle(data: Array[Byte], offs: Array[Int], rowCount: Int,
                       counter: TokenCounter): Unit = {
    var i = 0
    while (i < rowCount) {
      val r = new ByteReader(data, offs(i), offs(i + 1))
      val n = r.readVarUInt()
      var seen = 0
      while (seen < n) {
        val run = r.readVarUInt()
        val v = r.readZigZag()
        counter.add(v, run.toLong)
        seen += run
      }
      i += 1
    }
  }

  private def countBitpack(data: Array[Byte], offs: Array[Int], rowCount: Int,
                           width: Int, counter: TokenCounter): Unit = {
    var i = 0
    while (i < rowCount) {
      val r = new ByteReader(data, offs(i), offs(i + 1))
      val n = r.readVarUInt()
      if (width == 0) { if (n > 0) counter.add(0, n.toLong) }
      else {
        var acc = 0L
        var nbits = 0
        var pos = r.pos
        val mask = if (width == 32) 0xffffffffL else (1L << width) - 1
        var k = 0
        while (k < n) {
          while (nbits < width) { acc |= (data(pos) & 0xffL) << nbits; pos += 1; nbits += 8 }
          counter.add((acc & mask).toInt, 1L)
          acc >>>= width
          nbits -= width
          k += 1
        }
      }
      i += 1
    }
  }

  private def countFor(data: Array[Byte], offs: Array[Int], rowCount: Int,
                       width: Int, counter: TokenCounter): Unit = {
    var i = 0
    while (i < rowCount) {
      val r = new ByteReader(data, offs(i), offs(i + 1))
      val n = r.readVarUInt()
      if (n > 0) {
        val base = r.readZigZag()
        if (width == 0) counter.add(base, n.toLong)
        else {
          var acc = 0L
          var nbits = 0
          var pos = r.pos
          val mask = if (width == 32) 0xffffffffL else (1L << width) - 1
          var k = 0
          while (k < n) {
            while (nbits < width) { acc |= (data(pos) & 0xffL) << nbits; pos += 1; nbits += 8 }
            counter.add((acc & mask).toInt + base, 1L)
            acc >>>= width
            nbits -= width
            k += 1
          }
        }
      }
      i += 1
    }
  }

  private def countRaw(data: Array[Byte], offs: Array[Int], rowCount: Int,
                       counter: TokenCounter): Unit = {
    var i = 0
    while (i < rowCount) {
      val r = new ByteReader(data, offs(i), offs(i + 1))
      val n = r.readVarUInt()
      var k = 0
      while (k < n) { counter.add(r.readZigZag(), 1L); k += 1 }
      i += 1
    }
  }
}
