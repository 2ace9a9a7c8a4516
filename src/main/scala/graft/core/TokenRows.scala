package graft.core

/** Read-only view of a chunk's rows for header building + encoding.
  *
  * Two backings:
  * - discrete per-row arrays (tests, tools, single-row paths);
  * - ONE primitive slab with offset/length tables — the encode reduce path.
  *   GroupBuffer hands its accumulation array straight to the codecs, so
  *   emitting a chunk no longer copies every row into a fresh Array[Int]
  *   (8 bytes/token of pure memory-bus traffic — the measured 8→32 thread
  *   scaling limiter — plus one allocation per row of GC pressure).
  *
  * Accessors return (buf, start, len) triples so codec hot loops index the
  * backing array directly; nothing here allocates per row.
  */
final class TokenRows private (
    private val bufs: IndexedSeq[Array[Int]],
    private val slabArr: Array[Int],
    private val startsArr: Array[Int],
    private val lensArr: Array[Int],
    val rowCount: Int) extends Serializable {

  @inline def buf(i: Int): Array[Int] = if (bufs == null) slabArr else bufs(i)
  @inline def start(i: Int): Int = if (bufs == null) startsArr(i) else 0
  @inline def len(i: Int): Int = if (bufs == null) lensArr(i) else bufs(i).length

  def isEmpty: Boolean = rowCount == 0

  def totalTokens: Long = {
    var t = 0L
    var i = 0
    while (i < rowCount) { t += len(i); i += 1 }
    t
  }

  /** Materialized copy of row i — test/tool convenience, not a hot path. */
  def row(i: Int): Array[Int] = {
    val f = start(i)
    java.util.Arrays.copyOfRange(buf(i), f, f + len(i))
  }
}

object TokenRows {
  def ofArrays(rows: IndexedSeq[Array[Int]]): TokenRows =
    new TokenRows(rows, null, null, null, rows.length)

  /** Slab backing: row i occupies slab[starts(i), starts(i)+lens(i)). The
    * offset tables may be permutations (chunk rows are emitted in
    * (n_tok, doc_id) order while the slab holds arrival order).
    */
  def ofSlab(slab: Array[Int], starts: Array[Int], lens: Array[Int], n: Int): TokenRows =
    new TokenRows(null, slab, starts, lens, n)
}
