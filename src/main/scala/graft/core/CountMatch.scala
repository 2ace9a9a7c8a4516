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

  /** Sink for per-chunk token-count kernels — same split as BigramSink:
    * a folding counter or the sort-based fold below.
    */
  sealed abstract class TokenSink {
    def add(tok: Int, c: Long): Unit
  }

  /** Sort-based per-chunk token fold for chunks whose zone-mapped span
    * exceeds the dense counter (same rationale as BigramSortedFold: the
    * sparse LongMap paid two random-access probes per counted unit — on the
    * bench table that is one per FSST escape — where an append + one
    * primitive sort + run-length merge is sequential-memory cost).
    */
  final class TokenSortedFold extends TokenSink {
    private var keys = new Array[Int](1 << 12)
    private var n = 0
    private val heavy = mutable.LongMap.empty[Long]
    def add(tok: Int, c: Long): Unit =
      if (c == 1L) {
        if (n == keys.length) keys = java.util.Arrays.copyOf(keys, n << 1)
        keys(n) = tok
        n += 1
      } else heavy.update(tok.toLong, heavy.getOrElse(tok.toLong, 0L) + c)
    /** (tokens, counts), counts > 0, tokens ascending. */
    def result(): (Array[Int], Array[Long]) = {
      java.util.Arrays.sort(keys, 0, n)
      val hk = heavy.keys.toArray
      java.util.Arrays.sort(hk)
      val toks = new Array[Int](n + hk.length)
      val cs = new Array[Long](toks.length)
      var out = 0
      var i = 0
      var h = 0
      while (i < n || h < hk.length) {
        if (h >= hk.length || (i < n && keys(i).toLong < hk(h))) {
          val k = keys(i)
          var c = 0L
          while (i < n && keys(i) == k) { c += 1L; i += 1 }
          toks(out) = k; cs(out) = c; out += 1
        } else {
          val k = hk(h)
          var c = heavy(k)
          while (i < n && keys(i).toLong == k) { c += 1L; i += 1 }
          toks(out) = k.toInt; cs(out) = c; out += 1
          h += 1
        }
      }
      (java.util.Arrays.copyOf(toks, out), java.util.Arrays.copyOf(cs, out))
    }
  }

  /** Dense when the zone-mapped token range is small (≤2M slots = 16 MB of
    * longs, transient per chunk eval); hash otherwise. Chunks cap at 512Ki
    * tokens so the dense path covers every realistic vocab-id layout.
    */
  final class TokenCounter(minTok: Int, maxTok: Int) extends TokenSink {
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

  /** Sink for per-chunk bigram kernels: either a folding counter (dedups
    * per chunk) or a raw appender (streams triples to the downstream
    * aggregate). The kernels only call add().
    */
  sealed abstract class BigramSink {
    def add(t1: Int, t2: Int, c: Long): Unit
  }

  /** Sort-based per-chunk fold for wide-vocab chunks. The sparse
    * BigramCounter paid two LongMap probes per position (random access over
    * a multi-hundred-KB map — measured 18.2 s of the 25.6 s compressed
    * bigram histogram on the 385M-token bench table, BigramProbe), while
    * skipping the fold entirely tripled the downstream aggregate's input
    * (per-chunk pair repetition is ≈3× on that table — hot phrases). This
    * sink keeps the fold at sequential-memory cost: unit-count pairs append
    * as packed (t1, t2) longs and fold by ONE primitive sort + run-length
    * merge; the rare weighted entries (RLE run folds, FSST matrix
    * expansions) go to a small side map that merges during the run scan.
    * Output is deterministic (t1 asc, t2 asc) like the counter's.
    */
  final class BigramSortedFold extends BigramSink {
    private var keys = new Array[Long](1 << 12)
    private var n = 0
    private val heavy = mutable.LongMap.empty[Long]
    @inline private def pack(t1: Int, t2: Int): Long =
      ((t1.toLong << 32) | (t2.toLong & 0xffffffffL)) ^ 0x8000000080000000L
    def add(t1: Int, t2: Int, c: Long): Unit =
      if (c == 1L) {
        if (n == keys.length) keys = java.util.Arrays.copyOf(keys, n << 1)
        keys(n) = pack(t1, t2)
        n += 1
      } else {
        val k = pack(t1, t2)
        heavy.update(k, heavy.getOrElse(k, 0L) + c)
      }
    /** (t1s, t2s, counts), counts > 0, ordered by (t1, t2). */
    def result(): (Array[Int], Array[Int], Array[Long]) = {
      java.util.Arrays.sort(keys, 0, n)
      // heavy keys not present in the sorted stream must interleave in key
      // order: collect + sort them, then two-way merge with the run scan
      val hk = heavy.keys.toArray
      java.util.Arrays.sort(hk)
      val t1s = new Array[Int](math.min(n + hk.length, Int.MaxValue))
      val t2s = new Array[Int](t1s.length)
      val cs = new Array[Long](t1s.length)
      var out = 0
      var i = 0
      var h = 0
      @inline def emit(k: Long, c: Long): Unit = {
        val raw = k ^ 0x8000000080000000L
        t1s(out) = (raw >> 32).toInt
        t2s(out) = raw.toInt
        cs(out) = c
        out += 1
      }
      while (i < n || h < hk.length) {
        if (h >= hk.length || (i < n && keys(i) < hk(h))) {
          val k = keys(i) // k < next heavy key: pure run count
          var c = 0L
          while (i < n && keys(i) == k) { c += 1L; i += 1 }
          emit(k, c)
        } else {
          val k = hk(h)
          var c = heavy(k)
          while (i < n && keys(i) == k) { c += 1L; i += 1 }
          emit(k, c)
          h += 1
        }
      }
      (java.util.Arrays.copyOf(t1s, out), java.util.Arrays.copyOf(t2s, out),
        java.util.Arrays.copyOf(cs, out))
    }
  }

  /** Bigram (token-pair) accumulator: dense (span² longs) when the chunk's
    * zone-mapped token range is tiny, hash otherwise — distinct bigrams per
    * chunk are bounded by the chunk token cap either way.
    */
  final class BigramCounter(minTok: Int, maxTok: Int) extends BigramSink {
    // span bounded FIRST so span² cannot overflow (full-int-range chunks
    // have span ≈ 2^32; squaring that wraps Long)
    private val span: Long = maxTok.toLong - minTok.toLong + 1L
    private val dense: Array[Long] =
      if (span > 0 && span <= (1L << 10)) new Array[Long]((span * span).toInt) else null
    private val sparse: mutable.LongMap[Long] =
      if (dense == null) mutable.LongMap.empty[Long] else null

    def add(t1: Int, t2: Int, c: Long): Unit =
      if (dense != null) dense((t1 - minTok) * span.toInt + (t2 - minTok)) += c
      else {
        val k = (t1.toLong << 32) | (t2.toLong & 0xffffffffL)
        sparse.update(k, sparse.getOrElse(k, 0L) + c)
      }

    /** (t1s, t2s, counts) with counts > 0, ordered by (t1, t2). */
    def result(): (Array[Int], Array[Int], Array[Long]) = {
      if (dense != null) {
        var nz = 0
        var i = 0
        while (i < dense.length) { if (dense(i) != 0L) nz += 1; i += 1 }
        val t1s = new Array[Int](nz)
        val t2s = new Array[Int](nz)
        val cs = new Array[Long](nz)
        var k = 0
        i = 0
        while (i < dense.length) {
          if (dense(i) != 0L) {
            t1s(k) = minTok + i / span.toInt
            t2s(k) = minTok + i % span.toInt
            cs(k) = dense(i)
            k += 1
          }
          i += 1
        }
        (t1s, t2s, cs)
      } else {
        // sort by (t1, t2): the packed key misorders when the halves differ
        // in sign class — flipping the sign bit of EACH 32-bit half makes
        // signed-long order equal lexicographic (t1 signed, t2 signed), so a
        // primitive Arrays.sort replaces the boxed sortBy-on-tuples (this
        // sort dominated the sparse path's CPU on wide-vocab chunks)
        val sorted = sparse.keys.toArray
        var i = 0
        while (i < sorted.length) { sorted(i) ^= 0x8000000080000000L; i += 1 }
        java.util.Arrays.sort(sorted)
        val t1s = new Array[Int](sorted.length)
        val t2s = new Array[Int](sorted.length)
        val cs = new Array[Long](sorted.length)
        i = 0
        while (i < sorted.length) {
          val k = sorted(i) ^ 0x8000000080000000L
          t1s(i) = (k >> 32).toInt
          t2s(i) = k.toInt
          cs(i) = sparse(k)
          i += 1
        }
        (t1s, t2s, cs)
      }
    }
  }

  /** Bigram histogram of one whole chunk — the pair-count statistic behind
    * BPE-style merge analysis and co-occurrence studies — computed in each
    * codec's compressed domain. Bigrams never cross row boundaries.
    *
    *  - fsst:  one pass over code bytes. Intra-symbol bigrams come from the
    *           per-code occurrence counts × the symbol's internal pairs
    *           (expanded once per chunk); code→code boundary bigrams from a
    *           256×256 transition matrix (also expanded once); only
    *           boundaries touching an escape literal are recorded directly.
    *           Work: O(code bytes) + O(256² + 256·maxSymLen) per chunk.
    *  - rle:   a run of length r contributes (v,v)×(r−1) and one boundary
    *           pair per adjacent run — O(runs), repeated tokens untouched.
    *  - dict/bitpack/for/raw: walk packed/varint values with a previous-
    *           value cursor (no row arrays materialize).
    */
  def chunkBigrams(codec: String, header: Array[Byte], data: Array[Byte],
                   offs: Array[Int], rowCount: Int,
                   minTok: Int, maxTok: Int): (Array[Int], Array[Int], Array[Long]) = {
    val acc = new BigramCounter(minTok, maxTok)
    chunkBigramsInto(codec, header, data, offs, rowCount, acc)
    acc.result()
  }

  /** Per-chunk bigram statistics with a STATS-DRIVEN sink choice (round-5
    * verdict "what's wrong #1"): a narrow zone-mapped token span folds into
    * the dense counter (exact per-chunk dedup at one array bump per
    * position); a wide span — where per-chunk dedup buys almost nothing —
    * streams raw triples through a BigramAppender instead of paying two
    * sparse-map probes per position plus a per-chunk sort. Duplicate keys in
    * the streamed output merge in the downstream aggregate, so the summed
    * histogram is identical either way. RLE still folds whole runs and FSST
    * still folds its code/transition matrices before emission regardless of
    * sink.
    */
  def chunkBigramsAuto(codec: String, header: Array[Byte], data: Array[Byte],
                       offs: Array[Int], rowCount: Int,
                       minTok: Int, maxTok: Int): (Array[Int], Array[Int], Array[Long]) = {
    val span: Long = maxTok.toLong - minTok.toLong + 1L
    if (span > 0 && span <= (1L << 10)) chunkBigrams(codec, header, data, offs, rowCount, minTok, maxTok)
    else {
      val acc = new BigramSortedFold
      chunkBigramsInto(codec, header, data, offs, rowCount, acc)
      acc.result()
    }
  }

  private def chunkBigramsInto(codec: String, header: Array[Byte], data: Array[Byte],
                               offs: Array[Int], rowCount: Int, acc: BigramSink): Unit = {
    codec match {
      case FsstTokenCodec.name => bigramFsst(SymTab.fromBytes(header), data, offs, rowCount, acc)
      case RleCodec.name       => bigramRle(data, offs, rowCount, acc)
      case DictCodec.name =>
        val dict = DictCodec.readDict(header)
        val width = BitPack.bitsFor(math.max(dict.length - 1, 0))
        bigramPacked(data, offs, rowCount, width, i => dict(i), acc)
      case BitPackCodec.name =>
        bigramPacked(data, offs, rowCount, header(0) & 0xff, i => i, acc)
      case ForCodec.name       => bigramFor(data, offs, rowCount, header(0) & 0xff, acc)
      case RawCodec.name       => bigramRaw(data, offs, rowCount, acc)
      case other =>
        val dec = Codecs.byName(other).decoder(header)
        var i = 0
        while (i < rowCount) {
          val row = dec.decode(data, offs(i), offs(i + 1))
          var j = 1
          while (j < row.length) { acc.add(row(j - 1), row(j), 1L); j += 1 }
          i += 1
        }
    }
  }

  private def bigramFsst(st: SymTab, data: Array[Byte], offs: Array[Int],
                         rowCount: Int, acc: BigramSink): Unit = {
    val flat = st.flatTokens
    val flatOff = st.flatOffsets
    @inline def symLen(c: Int): Int = flatOff(c + 1) - flatOff(c)
    @inline def firstTok(c: Int): Int = flat(flatOff(c))
    @inline def lastTok(c: Int): Int = flat(flatOff(c + 1) - 1)
    val codeCnt = new Array[Long](256)
    val pairCnt = new Array[Long](256 * 256)
    var i = 0
    while (i < rowCount) {
      var pos = offs(i)
      val to = offs(i + 1)
      while ((data(pos) & 0x80) != 0) pos += 1
      pos += 1
      // unit cursor: previous unit is either a code (prevCode >= 0) or an
      // escape literal (prevIsEsc); bigrams never span rows
      var prevCode = -1
      var prevEscTok = 0
      var prevIsEsc = false
      var hasPrev = false
      while (pos < to) {
        val b = data(pos) & 0xff
        if (b != SymTab.EscapeCode) {
          pos += 1
          if (symLen(b) > 0) {
            codeCnt(b) += 1L
            if (hasPrev) {
              if (prevIsEsc) acc.add(prevEscTok, firstTok(b), 1L)
              else pairCnt((prevCode << 8) | b) += 1L
            }
            prevCode = b; prevIsEsc = false; hasPrev = true
          }
        } else {
          pos += 1
          var u = 0
          var sh = 0
          var bb = 0
          do {
            bb = data(pos) & 0xff; pos += 1
            u |= (bb & 0x7f) << sh; sh += 7
          } while ((bb & 0x80) != 0)
          val t = (u >>> 1) ^ -(u & 1)
          if (hasPrev) {
            if (prevIsEsc) acc.add(prevEscTok, t, 1L)
            else acc.add(lastTok(prevCode), t, 1L)
          }
          prevEscTok = t; prevIsEsc = true; hasPrev = true
        }
      }
      i += 1
    }
    // expand: intra-symbol bigrams × code count
    var c = 0
    while (c < 255) {
      val n = codeCnt(c)
      if (n != 0L) {
        var j = flatOff(c) + 1
        val e = flatOff(c + 1)
        while (j < e) { acc.add(flat(j - 1), flat(j), n); j += 1 }
      }
      c += 1
    }
    // expand: code→code boundary bigrams
    var a = 0
    while (a < 255) {
      var b = 0
      val rowBase = a << 8
      while (b < 255) {
        val n = pairCnt(rowBase | b)
        if (n != 0L) acc.add(lastTok(a), firstTok(b), n)
        b += 1
      }
      a += 1
    }
  }

  private def bigramRle(data: Array[Byte], offs: Array[Int], rowCount: Int,
                        acc: BigramSink): Unit = {
    var i = 0
    while (i < rowCount) {
      val r = new ByteReader(data, offs(i), offs(i + 1))
      val n = r.readVarUInt()
      var seen = 0
      var prev = 0
      var hasPrev = false
      while (seen < n) {
        val run = r.readVarUInt()
        val v = r.readZigZag()
        if (run > 1) acc.add(v, v, (run - 1).toLong)
        if (hasPrev) acc.add(prev, v, 1L)
        prev = v; hasPrev = true
        seen += run
      }
      i += 1
    }
  }

  private def bigramPacked(data: Array[Byte], offs: Array[Int], rowCount: Int,
                           width: Int, f: Int => Int, acc: BigramSink): Unit = {
    var i = 0
    while (i < rowCount) {
      val r = new ByteReader(data, offs(i), offs(i + 1))
      val n = r.readVarUInt()
      if (width == 0) { if (n > 1) acc.add(f(0), f(0), (n - 1).toLong) }
      else {
        var acc64 = 0L
        var nbits = 0
        var pos = r.pos
        val mask = if (width == 32) 0xffffffffL else (1L << width) - 1
        var prev = 0
        var k = 0
        while (k < n) {
          while (nbits < width) { acc64 |= (data(pos) & 0xffL) << nbits; pos += 1; nbits += 8 }
          val v = f((acc64 & mask).toInt)
          if (k > 0) acc.add(prev, v, 1L)
          prev = v
          acc64 >>>= width
          nbits -= width
          k += 1
        }
      }
      i += 1
    }
  }

  private def bigramFor(data: Array[Byte], offs: Array[Int], rowCount: Int,
                        width: Int, acc: BigramSink): Unit = {
    var i = 0
    while (i < rowCount) {
      val r = new ByteReader(data, offs(i), offs(i + 1))
      val n = r.readVarUInt()
      if (n > 0) {
        val base = r.readZigZag()
        if (width == 0) { if (n > 1) acc.add(base, base, (n - 1).toLong) }
        else {
          var acc64 = 0L
          var nbits = 0
          var pos = r.pos
          val mask = if (width == 32) 0xffffffffL else (1L << width) - 1
          var prev = 0
          var k = 0
          while (k < n) {
            while (nbits < width) { acc64 |= (data(pos) & 0xffL) << nbits; pos += 1; nbits += 8 }
            val v = (acc64 & mask).toInt + base
            if (k > 0) acc.add(prev, v, 1L)
            prev = v
            acc64 >>>= width
            nbits -= width
            k += 1
          }
        }
      }
      i += 1
    }
  }

  private def bigramRaw(data: Array[Byte], offs: Array[Int], rowCount: Int,
                        acc: BigramSink): Unit = {
    var i = 0
    while (i < rowCount) {
      val r = new ByteReader(data, offs(i), offs(i + 1))
      val n = r.readVarUInt()
      var prev = 0
      var k = 0
      while (k < n) {
        val v = r.readZigZag()
        if (k > 0) acc.add(prev, v, 1L)
        prev = v
        k += 1
      }
      i += 1
    }
  }

  /** Histogram of one whole chunk, dispatched per codec. `offs` has
    * rowCount+1 entries (see Offsets.unpack).
    */
  def chunkCounts(codec: String, header: Array[Byte], data: Array[Byte],
                  offs: Array[Int], rowCount: Int,
                  minTok: Int, maxTok: Int): (Array[Int], Array[Long]) = {
    val counter = new TokenCounter(minTok, maxTok)
    chunkCountsInto(codec, header, data, offs, rowCount, counter)
    counter.result()
  }

  /** Token histogram with the stats-driven sink choice: dense counter when
    * the span fits (one array bump per counted unit), sorted fold when it
    * does not (see TokenSortedFold). Summed output is identical.
    */
  def chunkCountsAuto(codec: String, header: Array[Byte], data: Array[Byte],
                      offs: Array[Int], rowCount: Int,
                      minTok: Int, maxTok: Int): (Array[Int], Array[Long]) = {
    val span: Long = maxTok.toLong - minTok.toLong + 1L
    if (span > 0 && span <= (1L << 21)) chunkCounts(codec, header, data, offs, rowCount, minTok, maxTok)
    else {
      val counter = new TokenSortedFold
      chunkCountsInto(codec, header, data, offs, rowCount, counter)
      counter.result()
    }
  }

  private def chunkCountsInto(codec: String, header: Array[Byte], data: Array[Byte],
                              offs: Array[Int], rowCount: Int, counter: TokenSink): Unit = {
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
  }

  /** FSST: per-chunk code histogram (SWAR-segmented, branch-free past
    * escapes), escapes counted directly, then one code→tokens expansion.
    */
  private def countFsst(st: SymTab, data: Array[Byte], offs: Array[Int],
                        rowCount: Int, counter: TokenSink): Unit = {
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
                        rowCount: Int, counter: TokenSink): Unit = {
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
                       counter: TokenSink): Unit = {
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
                           width: Int, counter: TokenSink): Unit = {
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
                       width: Int, counter: TokenSink): Unit = {
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
                       counter: TokenSink): Unit = {
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
