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

  private final class FsstHead(st: SymTab) extends HeadRowDecoder {
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
