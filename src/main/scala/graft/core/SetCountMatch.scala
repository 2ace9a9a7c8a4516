package graft.core

/** Per-row COUNT of tokens ∈ set over one encoded chunk — the quantitative
  * dual of SetMatch's ANY-semantics predicate: where `any_token_in_set`
  * answers "does this doc contain a banned token", this answers "how many"
  * — blocklist density, rare-token scoring, special-token accounting, and
  * the severity estimate for a pending Scrub pass, all straight off
  * compressed storage.
  *
  * Implementation: each codec's wire format streams through ChunkWalker
  * with a run-aware sink — an RLE run of r equal tokens contributes
  * r·[t ∈ set] in ONE fold, a constant packed row (width 0) likewise; the
  * per-token path is a branchless-ish binary search over the small sorted
  * set (SetMatch.contains). The zone-map + bloom chunk gate lives in the
  * caller (SetCountsGenerator): a gated-out chunk emits its rows at
  * metadata cost (id slab + one varint per row), never touching `data`.
  */
object SetCountMatch {

  private final class CountSink(sorted: Array[Int], counts: Array[Long],
                                nToks: Array[Int]) extends TokenSink {
    private var cur = 0L
    def rowStart(row: Int, n: Int): Unit = { cur = 0L; nToks(row) = n }
    def feed(t: Int): Unit = if (SetMatch.contains(sorted, t)) cur += 1
    override def feedRun(t: Int, r: Int): Unit =
      if (SetMatch.contains(sorted, t)) cur += r
    def rowEnd(row: Int): Unit = counts(row) = cur
  }

  /** (counts, nToks), one entry per row; `sorted` from SetMatch.sortedSet. */
  def chunkRowSetCounts(codec: String, header: Array[Byte], data: Array[Byte],
                        offs: Array[Int], rows: Int,
                        sorted: Array[Int]): (Array[Long], Array[Int]) = {
    val counts = new Array[Long](rows)
    val nToks = new Array[Int](rows)
    ChunkWalker.walk(codec, header, data, offs, rows,
      new CountSink(sorted, counts, nToks))
    (counts, nToks)
  }

  /** Token counts only (the gate-skip path): each row's leading varUInt —
    * no data-plane walk, counts are all zero by the gate's guarantee.
    */
  def rowTokenCounts(data: Array[Byte], offs: Array[Int], rows: Int): Array[Int] = {
    val nToks = new Array[Int](rows)
    var i = 0
    while (i < rows) {
      var pos = offs(i)
      var n = 0
      var shift = 0
      var b = 0
      do {
        b = data(pos) & 0xff; pos += 1
        n |= (b & 0x7f) << shift; shift += 7
      } while ((b & 0x80) != 0)
      nToks(i) = n
      i += 1
    }
    nToks
  }
}
