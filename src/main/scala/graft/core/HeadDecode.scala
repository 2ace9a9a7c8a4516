package graft.core

/** Partial row decode: materialize only the first min(k, n) tokens of one
  * encoded row — the READ-side dual of the write-side truncation
  * (encode.Truncate). Every codec's row payload is prefix-structured
  * (varUInt(n) + tokens in order), so the decoder stops after k tokens and
  * the row's tail bytes are never touched: raw/RLE stop the cursor, dict /
  * bitpack / FoR unpack exactly k packed values, FSST expands codes until
  * the budget and takes a prefix of the final symbol. Head-of-document
  * features (previews, lead-sentence heuristics, fixed-width model inputs)
  * on the encoded view pay O(k), not O(row).
  */
trait HeadRowDecoder {
  def decodeHead(bytes: Array[Byte], from: Int, to: Int, k: Int): Array[Int]
}

object HeadDecode {

  /** Per-(codec, header) decoder; parse the header once, then
    * [[HeadRowDecoder.decodeHead]] per row slice.
    */
  def decoder(codec: String, header: Array[Byte]): HeadRowDecoder = codec match {
    case FsstTokenCodec.name => new FsstHead(SymTab.fromBytes(header))
    case DictCodec.name =>
      val dict = DictCodec.readDict(header)
      new PackedHead(BitPack.bitsFor(math.max(dict.length - 1, 0)), hasBase = false, dict)
    case BitPackCodec.name => new PackedHead(header(0) & 0xff, hasBase = false, null)
    case ForCodec.name     => new PackedHead(header(0) & 0xff, hasBase = true, null)
    case RleCodec.name     => RleHead
    case RawCodec.name     => RawHead
    case other => // unknown codec: full decode + take (correct, never fast)
      val d = Codecs.byName(other).decoder(header)
      (bytes: Array[Byte], from: Int, to: Int, k: Int) =>
        d.decode(bytes, from, to).take(k)
  }

  /** One-shot eval (tests/fuzz; hot paths hold a decoder instead). */
  def eval(codec: String, header: Array[Byte], bytes: Array[Byte],
           from: Int, to: Int, k: Int): Array[Int] =
    decoder(codec, header).decodeHead(bytes, from, to, k)

  private object RawHead extends HeadRowDecoder {
    def decodeHead(bytes: Array[Byte], from: Int, to: Int, k: Int): Array[Int] = {
      val r = new ByteReader(bytes, from, to)
      val n = r.readVarUInt()
      val m = math.min(n, math.max(k, 0))
      val out = new Array[Int](m)
      var i = 0
      while (i < m) { out(i) = r.readZigZag(); i += 1 }
      out
    }
  }

  private object RleHead extends HeadRowDecoder {
    def decodeHead(bytes: Array[Byte], from: Int, to: Int, k: Int): Array[Int] = {
      val r = new ByteReader(bytes, from, to)
      val n = r.readVarUInt()
      val m = math.min(n, math.max(k, 0))
      val out = new Array[Int](m)
      var i = 0
      while (i < m) {
        val run = r.readVarUInt()
        val v = r.readZigZag()
        var j = 0
        while (j < run && i < m) { out(i) = v; i += 1; j += 1 }
      }
      out
    }
  }

  /** dict (table != null: packed dictionary indices), bitpack (no base),
    * FoR (per-row zigzag base before the packed deltas).
    */
  private final class PackedHead(width: Int, hasBase: Boolean,
                                 table: Array[Int]) extends HeadRowDecoder {
    def decodeHead(bytes: Array[Byte], from: Int, to: Int, k: Int): Array[Int] = {
      val r = new ByteReader(bytes, from, to)
      val n = r.readVarUInt()
      val m = math.min(n, math.max(k, 0))
      if (m == 0) return Array.emptyIntArray
      val base = if (hasBase) r.readZigZag() else 0
      if (table != null) BitPack.unpack(bytes, r.pos, m, width, i => table(i))
      else BitPack.unpack(bytes, r.pos, m, width, d => d + base)
    }
  }

  private[core] final class FsstHead(st: SymTab) extends HeadRowDecoder {
    private val flat = st.flatTokens
    private val flatOff = st.flatOffsets
    def decodeHead(bytes: Array[Byte], from: Int, to: Int, k: Int): Array[Int] = {
      var pos = from
      var n = 0
      var shift = 0
      var b0 = 0
      do {
        b0 = bytes(pos) & 0xff; pos += 1
        n |= (b0 & 0x7f) << shift; shift += 7
      } while ((b0 & 0x80) != 0)
      val m = math.min(n, math.max(k, 0))
      val out = new Array[Int](m)
      var i = 0
      while (i < m) {
        val c = bytes(pos) & 0xff
        pos += 1
        if (c == SymTab.EscapeCode) {
          var u = 0
          var sh = 0
          var bb = 0
          do {
            bb = bytes(pos) & 0xff; pos += 1
            u |= (bb & 0x7f) << sh; sh += 7
          } while ((bb & 0x80) != 0)
          out(i) = (u >>> 1) ^ -(u & 1)
          i += 1
        } else {
          // the final symbol may cross the budget: take its prefix
          var j = flatOff(c)
          val e = flatOff(c + 1)
          while (j < e && i < m) { out(i) = flat(j); i += 1; j += 1 }
        }
      }
      out
    }
  }
}

/** Partial SUFFIX decode: the last k tokens of one encoded row, with the
  * exact semantics of Spark's `slice(arr, -k, k)` — a row SHORTER than k
  * returns EMPTY (the builtin resolves a negative start index past the
  * front to an empty slice), so the optimizer rewrite is a strict
  * equivalence. Packed codecs random-access the bit stream at index n−k
  * ([[BitPack.unpackAt]]); RLE/raw skip runs/varints to the cut; FSST walks
  * code lengths WITHOUT expanding symbols until the cut (one length-table
  * load per code byte, escapes skipped without zigzag decode — the same
  * skip phase as the positional suffix matcher), then decodes k tokens,
  * taking the suffix of a cut-straddling symbol.
  */
trait TailRowDecoder {
  def decodeTail(bytes: Array[Byte], from: Int, to: Int, k: Int): Array[Int]
}

object TailDecode {

  def decoder(codec: String, header: Array[Byte]): TailRowDecoder = codec match {
    case FsstTokenCodec.name => new FsstTail(SymTab.fromBytes(header))
    case DictCodec.name =>
      val dict = DictCodec.readDict(header)
      new PackedTail(BitPack.bitsFor(math.max(dict.length - 1, 0)), hasBase = false, dict)
    case BitPackCodec.name => new PackedTail(header(0) & 0xff, hasBase = false, null)
    case ForCodec.name     => new PackedTail(header(0) & 0xff, hasBase = true, null)
    case RleCodec.name     => RleTail
    case RawCodec.name     => RawTail
    case other =>
      val d = Codecs.byName(other).decoder(header)
      (bytes: Array[Byte], from: Int, to: Int, k: Int) => {
        val row = d.decode(bytes, from, to)
        if (row.length < k || k < 0) Array.emptyIntArray else row.takeRight(k)
      }
  }

  /** One-shot eval (tests/fuzz; hot paths hold a decoder instead). */
  def eval(codec: String, header: Array[Byte], bytes: Array[Byte],
           from: Int, to: Int, k: Int): Array[Int] =
    decoder(codec, header).decodeTail(bytes, from, to, k)

  private object RawTail extends TailRowDecoder {
    def decodeTail(bytes: Array[Byte], from: Int, to: Int, k: Int): Array[Int] = {
      val r = new ByteReader(bytes, from, to)
      val n = r.readVarUInt()
      if (k < 0 || n < k) return Array.emptyIntArray
      var skip = n - k
      while (skip > 0) { r.readVarUInt(); skip -= 1 } // zigzag varints scan the same
      val out = new Array[Int](k)
      var i = 0
      while (i < k) { out(i) = r.readZigZag(); i += 1 }
      out
    }
  }

  private object RleTail extends TailRowDecoder {
    def decodeTail(bytes: Array[Byte], from: Int, to: Int, k: Int): Array[Int] = {
      val r = new ByteReader(bytes, from, to)
      val n = r.readVarUInt()
      if (k < 0 || n < k) return Array.emptyIntArray
      val out = new Array[Int](k)
      val cut = n - k
      var cnt = 0
      var i = 0
      while (i < k) {
        val run = r.readVarUInt()
        val v = r.readZigZag()
        if (cnt + run > cut) {
          // emit the run's tokens past the cut
          var j = math.max(cut - cnt, 0)
          while (j < run && i < k) { out(i) = v; i += 1; j += 1 }
        }
        cnt += run
      }
      out
    }
  }

  private final class PackedTail(width: Int, hasBase: Boolean,
                                 table: Array[Int]) extends TailRowDecoder {
    def decodeTail(bytes: Array[Byte], from: Int, to: Int, k: Int): Array[Int] = {
      val r = new ByteReader(bytes, from, to)
      val n = r.readVarUInt()
      if (k < 0 || n < k) return Array.emptyIntArray
      if (k == 0) return Array.emptyIntArray
      val base = if (hasBase) r.readZigZag() else 0
      if (table != null) BitPack.unpackAt(bytes, r.pos, (n - k).toLong, k, width, i => table(i))
      else BitPack.unpackAt(bytes, r.pos, (n - k).toLong, k, width, d => d + base)
    }
  }

  private final class FsstTail(st: SymTab) extends TailRowDecoder {
    private val flat = st.flatTokens
    private val flatOff = st.flatOffsets
    private val lens = st.lens
    def decodeTail(bytes: Array[Byte], from: Int, to: Int, k: Int): Array[Int] = {
      var pos = from
      var n = 0
      var shift = 0
      var b0 = 0
      do {
        b0 = bytes(pos) & 0xff; pos += 1
        n |= (b0 & 0x7f) << shift; shift += 7
      } while ((b0 & 0x80) != 0)
      if (k < 0 || n < k) return Array.emptyIntArray
      val out = new Array[Int](k)
      val cut = n - k
      var cnt = 0
      var i = 0
      // skip phase: count tokens per code byte, never expand symbols
      while (cnt < cut) {
        val c = bytes(pos) & 0xff
        pos += 1
        if (c == SymTab.EscapeCode) {
          while ((bytes(pos) & 0x80) != 0) pos += 1
          pos += 1
          cnt += 1
        } else {
          val len = lens(c)
          if (cnt + len <= cut) cnt += len
          else {
            // cut lands inside this symbol: emit its suffix and stop skipping
            // (suffix length = cnt+len−cut ≤ n−cut = k, so no bound check)
            var j = flatOff(c) + (cut - cnt)
            val e = flatOff(c + 1)
            while (j < e) { out(i) = flat(j); i += 1; j += 1 }
            cnt = cut
          }
        }
      }
      // decode phase: the remaining code stream spells exactly k−i tokens
      while (i < k) {
        val c = bytes(pos) & 0xff
        pos += 1
        if (c == SymTab.EscapeCode) {
          var u = 0
          var sh = 0
          var bb = 0
          do {
            bb = bytes(pos) & 0xff; pos += 1
            u |= (bb & 0x7f) << sh; sh += 7
          } while ((bb & 0x80) != 0)
          out(i) = (u >>> 1) ^ -(u & 1)
          i += 1
        } else {
          var j = flatOff(c)
          val e = flatOff(c + 1)
          while (j < e) { out(i) = flat(j); i += 1; j += 1 }
        }
      }
      out
    }
  }
}

/** Arbitrary mid-window partial decode: `slice(tokens, s, k)` for ANY nonzero
  * start on the encoded row — the general form of [[HeadDecode]] (s = 1) and
  * [[TailDecode]] (s = −k). Exact builtin `Slice` semantics: 1-based start,
  * negative start resolves from the end (lo = n + s), a start that resolves
  * before the front or past the end slices to EMPTY, and the window clips at
  * the row end (m = min(k, n − lo)). Cost is O(skip + k): packed codecs
  * random-access the bit stream at lo; RLE/raw skip runs/varints; FSST skips
  * via code lengths without expanding symbols, then decodes m tokens taking
  * the suffix of a window-entering symbol and the prefix of a window-leaving
  * one. Fixed-stride model-input windows ("tokens 128..256 of every doc")
  * on the encoded view pay the window, not the document.
  */
trait SliceRowDecoder {
  /** `s` is the raw 1-based (or negative) builtin start, `s != 0`; `k >= 0`. */
  def decodeSlice(bytes: Array[Byte], from: Int, to: Int, s: Int, k: Int): Array[Int]
}

object SliceDecode {

  /** Builtin window resolution: (lo, m) with lo the 0-based first index and
    * m the clipped length; m == 0 ⇒ empty slice.
    */
  @inline def window(n: Int, s: Int, k: Int): Long = {
    val lo = if (s > 0) s - 1 else n + s
    if (lo < 0 || lo >= n || k <= 0) -1L
    else (lo.toLong << 32) | math.min(k, n - lo).toLong
  }

  def decoder(codec: String, header: Array[Byte]): SliceRowDecoder = codec match {
    case FsstTokenCodec.name => new FsstSlice(SymTab.fromBytes(header))
    case DictCodec.name =>
      val dict = DictCodec.readDict(header)
      new PackedSlice(BitPack.bitsFor(math.max(dict.length - 1, 0)), hasBase = false, dict)
    case BitPackCodec.name => new PackedSlice(header(0) & 0xff, hasBase = false, null)
    case ForCodec.name     => new PackedSlice(header(0) & 0xff, hasBase = true, null)
    case RleCodec.name     => RleSlice
    case RawCodec.name     => RawSlice
    case other =>
      val d = Codecs.byName(other).decoder(header)
      (bytes: Array[Byte], from: Int, to: Int, s: Int, k: Int) => {
        val row = d.decode(bytes, from, to)
        val w = window(row.length, s, k)
        if (w < 0) Array.emptyIntArray
        else java.util.Arrays.copyOfRange(row, (w >>> 32).toInt, (w >>> 32).toInt + w.toInt)
      }
  }

  /** One-shot eval (tests/fuzz; hot paths hold a decoder instead). */
  def eval(codec: String, header: Array[Byte], bytes: Array[Byte],
           from: Int, to: Int, s: Int, k: Int): Array[Int] =
    decoder(codec, header).decodeSlice(bytes, from, to, s, k)

  private object RawSlice extends SliceRowDecoder {
    def decodeSlice(bytes: Array[Byte], from: Int, to: Int, s: Int, k: Int): Array[Int] = {
      val r = new ByteReader(bytes, from, to)
      val n = r.readVarUInt()
      val w = window(n, s, k)
      if (w < 0) return Array.emptyIntArray
      var skip = (w >>> 32).toInt
      val m = w.toInt
      while (skip > 0) { r.readVarUInt(); skip -= 1 } // zigzag varints scan the same
      val out = new Array[Int](m)
      var i = 0
      while (i < m) { out(i) = r.readZigZag(); i += 1 }
      out
    }
  }

  private object RleSlice extends SliceRowDecoder {
    def decodeSlice(bytes: Array[Byte], from: Int, to: Int, s: Int, k: Int): Array[Int] = {
      val r = new ByteReader(bytes, from, to)
      val n = r.readVarUInt()
      val w = window(n, s, k)
      if (w < 0) return Array.emptyIntArray
      val lo = (w >>> 32).toInt
      val m = w.toInt
      val out = new Array[Int](m)
      var cnt = 0
      var i = 0
      while (i < m) {
        val run = r.readVarUInt()
        val v = r.readZigZag()
        if (cnt + run > lo) {
          var j = math.max(lo - cnt, 0)
          while (j < run && i < m) { out(i) = v; i += 1; j += 1 }
        }
        cnt += run
      }
      out
    }
  }

  private final class PackedSlice(width: Int, hasBase: Boolean,
                                  table: Array[Int]) extends SliceRowDecoder {
    def decodeSlice(bytes: Array[Byte], from: Int, to: Int, s: Int, k: Int): Array[Int] = {
      val r = new ByteReader(bytes, from, to)
      val n = r.readVarUInt()
      val w = window(n, s, k)
      if (w < 0) return Array.emptyIntArray
      val lo = (w >>> 32).toInt
      val m = w.toInt
      val base = if (hasBase) r.readZigZag() else 0
      if (table != null) BitPack.unpackAt(bytes, r.pos, lo.toLong, m, width, i => table(i))
      else BitPack.unpackAt(bytes, r.pos, lo.toLong, m, width, d => d + base)
    }
  }

  private final class FsstSlice(st: SymTab) extends SliceRowDecoder {
    private val flat = st.flatTokens
    private val flatOff = st.flatOffsets
    private val lens = st.lens
    def decodeSlice(bytes: Array[Byte], from: Int, to: Int, s: Int, k: Int): Array[Int] = {
      var pos = from
      var n = 0
      var shift = 0
      var b0 = 0
      do {
        b0 = bytes(pos) & 0xff; pos += 1
        n |= (b0 & 0x7f) << shift; shift += 7
      } while ((b0 & 0x80) != 0)
      val w = window(n, s, k)
      if (w < 0) return Array.emptyIntArray
      val cut = (w >>> 32).toInt
      val m = w.toInt
      val out = new Array[Int](m)
      var cnt = 0
      var i = 0
      // skip phase: count tokens per code byte, never expand symbols; the
      // window may OPEN inside a symbol (emit its suffix, clipped by m —
      // unlike the tail decoder, a mid window can also CLOSE inside it)
      while (cnt < cut) {
        val c = bytes(pos) & 0xff
        pos += 1
        if (c == SymTab.EscapeCode) {
          while ((bytes(pos) & 0x80) != 0) pos += 1
          pos += 1
          cnt += 1
        } else {
          val len = lens(c)
          if (cnt + len <= cut) cnt += len
          else {
            var j = flatOff(c) + (cut - cnt)
            val e = flatOff(c + 1)
            while (j < e && i < m) { out(i) = flat(j); i += 1; j += 1 }
            cnt = cut
          }
        }
      }
      // decode phase: emit until the window closes, taking the prefix of a
      // window-leaving symbol
      while (i < m) {
        val c = bytes(pos) & 0xff
        pos += 1
        if (c == SymTab.EscapeCode) {
          var u = 0
          var sh = 0
          var bb = 0
          do {
            bb = bytes(pos) & 0xff; pos += 1
            u |= (bb & 0x7f) << sh; sh += 7
          } while ((bb & 0x80) != 0)
          out(i) = (u >>> 1) ^ -(u & 1)
          i += 1
        } else {
          var j = flatOff(c)
          val e = flatOff(c + 1)
          while (j < e && i < m) { out(i) = flat(j); i += 1; j += 1 }
        }
      }
      out
    }
  }
}
