package graft.core

/** Compressed-domain pattern evaluation for the POSITIONAL codecs, extending
  * the engine's FSST-domain matching (FsstMatch) to dict and RLE chunks:
  *
  * - dict: pattern tokens map to dictionary INDICES once per (chunk,
  *   pattern); rows then match on the bit-packed index stream — the token
  *   values are never materialized. A pattern token absent from the
  *   dictionary proves the whole chunk matchless (exact, not probabilistic).
  * - rle: rows match at RUN granularity — a run of 10 000 equal tokens is
  *   one comparison, not 10 000. The pattern is itself run-compressed; run
  *   boundary discipline (maximal runs inside both row and pattern) gives
  *   exact alignment rules: interior pattern runs need exact counts, edge
  *   runs need ≥.
  *
  * Both are existence-exact against TokenMatch (property-fuzzed in
  * MatcherSpec). FoR/bitpack rows stay decode-then-match: their per-row
  * bases make a pattern's packed image row-dependent.
  */
object DictMatch {

  /** Token-domain parts → index-domain parts via the SORTED dict; None when
    * any pattern token is absent (every mode needs all its tokens present,
    * so the chunk provably has no matching row).
    */
  def translate(dict: Array[Int], parts: Array[Array[Int]]): Option[Array[Array[Int]]] = {
    val out = new Array[Array[Int]](parts.length)
    var k = 0
    while (k < parts.length) {
      val p = parts(k)
      val q = new Array[Int](p.length)
      var i = 0
      while (i < p.length) {
        val idx = java.util.Arrays.binarySearch(dict, p(i))
        if (idx < 0) return None
        q(i) = idx
        i += 1
      }
      out(k) = q
      k += 1
    }
    Some(out)
  }
}

/** Equality without decode for ANY positional codec: every encoder is a
  * canonical (deterministic, row-content-only) function, so
  * `row == pattern  ⟺  encode(row) == encode(pattern)` — one byte compare
  * per row. The reference's constant-re-encode equality pushdown (E5)
  * generalized beyond FSST. Guards reject patterns whose encoding would
  * ALIAS a different value (token outside the dict, or outside the chunk's
  * bit-pack width — where packing truncates silently).
  */
object PackedEquals {

  /** Encoded image of `part` under the chunk's codec; None = the pattern
    * provably cannot equal any row of this chunk.
    */
  def patternImage(codecName: String, header: Array[Byte], part: Array[Int]): Option[Array[Byte]] = {
    codecName match {
      case DictCodec.name =>
        val dict = DictCodec.readDict(header)
        var i = 0
        while (i < part.length) {
          if (java.util.Arrays.binarySearch(dict, part(i)) < 0) return None
          i += 1
        }
      case BitPackCodec.name =>
        val width = header(0) & 0xff
        val max = if (width >= 32) Long.MaxValue else (1L << width) - 1
        var i = 0
        while (i < part.length) {
          if (part(i) < 0 || part(i) > max) return None
          i += 1
        }
      case ForCodec.name =>
        if (part.nonEmpty) {
          val width = header(0) & 0xff
          var min = part(0)
          var max = part(0)
          var i = 1
          while (i < part.length) {
            if (part(i) < min) min = part(i)
            if (part(i) > max) max = part(i)
            i += 1
          }
          val cap = if (width >= 32) Long.MaxValue else (1L << width) - 1
          if (max.toLong - min.toLong > cap) return None
        }
      case RleCodec.name | RawCodec.name => // varints encode any int faithfully
      case _ => return None // fsst has its own compressed-domain equals
    }
    val w = new ByteWriter(part.length * 3 + 8)
    Codecs.byName(codecName).encoder(header).encode(part, w)
    Some(w.toBytes)
  }

  /** Does the encoded row slice equal the pattern image byte-for-byte? */
  def rowEquals(bytes: Array[Byte], from: Int, to: Int, image: Array[Byte]): Boolean = {
    if (to - from != image.length) return false
    var i = 0
    while (i < image.length) {
      if (bytes(from + i) != image(i)) return false
      i += 1
    }
    true
  }
}

/** Anchored (prefix/suffix) matching on FoR/bitpack rows WITHOUT decoding
  * the row: the per-row base made these codecs decode-then-match in earlier
  * rounds; anchored modes only need the first (or last) m stored values, so
  * the matcher reads the row's base (one varint, FoR only) and unpack-
  * compares exactly m width-bit values against (pattern − base) — the
  * reference's constant-re-encode idea (/root/reference/src/FsstWrapper.cpp:124-144)
  * applied against each row's own frame. Work is O(m) per row with early
  * exit; the row's remaining tokens are never touched. Contains stays
  * decode-then-match for these codecs (a sliding bit-phase compare is a
  * whole-row scan anyway).
  */
object PackedAnchor {

  /** Compare stored values [startIdx, startIdx+m) of an LSB-first packed
    * payload at `payloadStart` against part(i) − base.
    */
  private def matchAt(bytes: Array[Byte], payloadStart: Int, width: Int,
                      startIdx: Long, part: Array[Int], base: Int): Boolean = {
    if (width == 0) {
      // width 0: every stored value is 0 → every token equals base
      var i = 0
      while (i < part.length) {
        if (part(i) != base) return false
        i += 1
      }
      return true
    }
    val bitPos = startIdx * width
    var pos = payloadStart + (bitPos >>> 3).toInt
    var acc = 0L
    var nbits = 0
    val skip = (bitPos & 7).toInt
    if (skip > 0) {
      acc = (bytes(pos) & 0xffL) >>> skip
      nbits = 8 - skip
      pos += 1
    }
    val mask = if (width >= 32) 0xffffffffL else (1L << width) - 1
    var i = 0
    while (i < part.length) {
      while (nbits < width) {
        acc |= (bytes(pos) & 0xffL) << nbits
        pos += 1
        nbits += 8
      }
      if ((acc & mask).toInt + base != part(i)) return false
      acc >>>= width
      nbits -= width
      i += 1
    }
    true
  }

  /** Prefix/suffix eval on one FoR or bitpack row slice. */
  def eval(codecName: String, header: Array[Byte], bytes: Array[Byte],
           from: Int, to: Int, mode: String, part: Array[Int]): Boolean = {
    val m = part.length
    if (m == 0) return true
    val width = header(0) & 0xff
    val r = new ByteReader(bytes, from, to)
    val n = r.readVarUInt()
    if (n < m) return false
    val base = if (codecName == ForCodec.name) r.readZigZag() else 0
    val startIdx = if (mode == PatternMode.Prefix) 0L else (n - m).toLong
    matchAt(bytes, r.pos, width, startIdx, part, base)
  }

  def supports(codecName: String, mode: String): Boolean =
    (codecName == ForCodec.name || codecName == BitPackCodec.name) &&
      (mode == PatternMode.Prefix || mode == PatternMode.Suffix)
}

/** Run-level matching on the RLE row byte stream (varUInt n, then
  * {varUInt run, zigzag value}*). Rows are materialized as run arrays (~n /
  * mean-run-length entries), never as tokens.
  */
object RleMatch {

  /** Pattern tokens → maximal runs (values, counts). */
  def patternRuns(p: Array[Int]): (Array[Int], Array[Int]) = {
    if (p.length == 0) return (Array.emptyIntArray, Array.emptyIntArray)
    val vs = new scala.collection.mutable.ArrayBuffer[Int]
    val cs = new scala.collection.mutable.ArrayBuffer[Int]
    var i = 0
    while (i < p.length) {
      val v = p(i)
      var run = 1
      while (i + run < p.length && p(i + run) == v) run += 1
      vs += v
      cs += run
      i += run
    }
    (vs.toArray, cs.toArray)
  }

  /** Row runs decoded from the RLE byte slice. */
  def rowRuns(bytes: Array[Byte], from: Int, to: Int): (Array[Int], Array[Int], Int) = {
    val r = new ByteReader(bytes, from, to)
    val n = r.readVarUInt()
    val vs = new scala.collection.mutable.ArrayBuffer[Int]
    val cs = new scala.collection.mutable.ArrayBuffer[Int]
    while (r.pos < to) {
      cs += r.readVarUInt()
      vs += r.readZigZag()
    }
    (vs.toArray, cs.toArray, n)
  }

  /** Match of pattern runs at row-run offset `at`, where the first pattern
    * run may use only the TAIL of row run `at` (contains semantics) when
    * `firstAnchored` is false; interior runs must be exact; the last pattern
    * run may be a HEAD of its row run. `headroom` = tokens of run `at`
    * already consumed by an earlier multi-infix part.
    */
  private def matchAt(rv: Array[Int], rc: Array[Int], at: Int, headroom: Int,
                      pv: Array[Int], pc: Array[Int], firstAnchored: Boolean): Boolean = {
    val k = pv.length
    if (k == 0) return true
    if (at + k > rv.length) return false
    // first run
    val avail0 = rc(at) - headroom
    if (rv(at) != pv(0)) return false
    if (k == 1) return avail0 >= pc(0)
    if (firstAnchored) {
      if (avail0 != pc(0)) return false
    } else if (avail0 < pc(0)) return false
    // interior runs: exact
    var j = 1
    while (j < k - 1) {
      if (rv(at + j) != pv(j) || rc(at + j) != pc(j)) return false
      j += 1
    }
    // last run: head-aligned
    rv(at + k - 1) == pv(k - 1) && rc(at + k - 1) >= pc(k - 1)
  }

  def contains(rv: Array[Int], rc: Array[Int], pv: Array[Int], pc: Array[Int]): Boolean = {
    if (pv.length == 0) return true
    var at = 0
    while (at <= rv.length - pv.length) {
      if (matchAt(rv, rc, at, 0, pv, pc, firstAnchored = false)) return true
      at += 1
    }
    false
  }

  def prefix(rv: Array[Int], rc: Array[Int], pv: Array[Int], pc: Array[Int]): Boolean =
    pv.length == 0 || matchAt(rv, rc, 0, 0, pv, pc, firstAnchored = true)

  def suffix(rv: Array[Int], rc: Array[Int], pv: Array[Int], pc: Array[Int]): Boolean = {
    val k = pv.length
    if (k == 0) return true
    if (k > rv.length) return false
    // mirror of prefix: the FIRST pattern run is tail-aligned (>=), interior
    // exact, the LAST pattern run must end the row exactly
    val at = rv.length - k
    if (rv(at) != pv(0)) return false
    if (k == 1) return rc(at) >= pc(0)
    if (rc(at) < pc(0)) return false
    var j = 1
    while (j < k - 1) {
      if (rv(at + j) != pv(j) || rc(at + j) != pc(j)) return false
      j += 1
    }
    rv(rv.length - 1) == pv(k - 1) && rc(rv.length - 1) == pc(k - 1)
  }

  def equalsPat(rv: Array[Int], rc: Array[Int], pv: Array[Int], pc: Array[Int]): Boolean = {
    if (rv.length != pv.length) return false
    var j = 0
    while (j < pv.length) {
      if (rv(j) != pv(j) || rc(j) != pc(j)) return false
      j += 1
    }
    true
  }

  /** Ordered greedy multi-infix at run granularity; parts may resume inside
    * the run a previous part ended in (the stop_pos analog).
    */
  def multiInfix(rv: Array[Int], rc: Array[Int],
                 pvs: Array[Array[Int]], pcs: Array[Array[Int]]): Boolean = {
    var at = 0
    var headroom = 0 // tokens of run `at` already consumed
    var part = 0
    while (part < pvs.length) {
      val pv = pvs(part)
      val pc = pcs(part)
      var found = false
      var a = at
      var h = headroom
      while (!found && a <= rv.length - pv.length) {
        if (matchAt(rv, rc, a, h, pv, pc, firstAnchored = false)) {
          found = true
          // greedy-first-match END position: the match consumes pc(last) of
          // run a+k-1 — but for a tail-aligned first run the match sits at
          // the END of the first run, so earliest end = as computed for the
          // FIRST admissible alignment; resume within the last run
          val lastRun = a + pv.length - 1
          val consumedInLast =
            if (pv.length == 1) {
              // earliest match inside this run starts right after headroom
              h + pc(0)
            } else pc(pv.length - 1)
          if (consumedInLast >= rc(lastRun)) {
            at = lastRun + 1
            headroom = 0
          } else {
            at = lastRun
            headroom = consumedInLast
          }
        } else {
          a += 1
          h = 0
        }
      }
      if (!found) return false
      part += 1
    }
    true
  }

  /** Whole-mode eval on a row's RLE bytes. */
  def eval(mode: String, bytes: Array[Byte], from: Int, to: Int,
           pvs: Array[Array[Int]], pcs: Array[Array[Int]], totalLens: Array[Int]): Boolean = {
    val (rv, rc, n) = rowRuns(bytes, from, to)
    mode match {
      case PatternMode.Contains =>
        n >= totalLens(0) && contains(rv, rc, pvs(0), pcs(0))
      case PatternMode.Prefix =>
        n >= totalLens(0) && prefix(rv, rc, pvs(0), pcs(0))
      case PatternMode.Suffix =>
        n >= totalLens(0) && suffix(rv, rc, pvs(0), pcs(0))
      case PatternMode.Equals =>
        n == totalLens(0) && equalsPat(rv, rc, pvs(0), pcs(0))
      case PatternMode.MultiInfix =>
        multiInfix(rv, rc, pvs, pcs)
    }
  }
}
