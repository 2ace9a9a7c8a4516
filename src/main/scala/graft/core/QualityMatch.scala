package graft.core

/** Per-document token-quality profile streamed off ONE encoded chunk —
  * the compressed-domain form of a training pipeline's quality gate
  * (Gopher/C4-style heuristics over the TOKEN column): for every row,
  *
  *   - n_tok       decoded token count (the row's varint prefix),
  *   - n_distinct  exact distinct-token count,
  *   - max_run     longest run of equal adjacent tokens (degenerate-repeat
  *                 signal; RLE chunks fold whole runs in O(1) per run),
  *   - top_cnt     occurrence count of the row's most frequent token
  *                 (mode weight — the "one token dominates" signal).
  *
  * All four are exact integers, so the DuckDB oracle can compare by hash.
  * The per-row distinct map is a linear-probing open-addressed table sized
  * to the row (load factor ≤ 1/2), allocated per row — quality profiling is
  * per-token dominated, so the allocation is noise and keeps a giant row
  * from taxing every later small row with an O(capacity) clear.
  *
  * Reference frame: the reference engine exposes per-block used_chars
  * statistics (/root/reference/src/BenchmarkDriver.hpp:28-37) but has no
  * per-ROW profile; this is the training-pipeline generalization over the
  * same wire formats.
  */
object QualityMatch {

  @inline private def mix32(t: Int): Int = {
    var h = t * 0x9e3779b1
    h ^= h >>> 16
    h & 0x7fffffff
  }

  final case class Profiles(nTok: Array[Int], nDistinct: Array[Int],
                            maxRun: Array[Int], topCnt: Array[Int])

  private final class ProfileSink(rows: Int) extends TokenSink {
    val nTok = new Array[Int](rows)
    val nDistinct = new Array[Int](rows)
    val maxRun = new Array[Int](rows)
    val topCnt = new Array[Int](rows)

    private var keys: Array[Int] = null
    private var cnts: Array[Int] = null
    private var mask = 0
    private var distinct = 0
    private var top = 0
    private var best = 0
    private var run = 0
    private var prev = 0
    private var hasPrev = false
    private var row = 0

    def rowStart(r: Int, n: Int): Unit = {
      row = r
      nTok(r) = n
      distinct = 0; top = 0; best = 0; run = 0; hasPrev = false
      var cap = 16
      while (cap < (n << 1)) cap <<= 1 // ≤ n distinct keys → load ≤ 1/2
      if (keys == null || keys.length != cap) {
        keys = new Array[Int](cap)
        cnts = new Array[Int](cap)
      } else {
        java.util.Arrays.fill(cnts, 0)
      }
      mask = cap - 1
    }

    def feed(t: Int): Unit = feedRun(t, 1)

    override def feedRun(t: Int, r: Int): Unit = {
      if (hasPrev && t == prev) run += r
      else { run = r; prev = t; hasPrev = true }
      if (run > best) best = run
      // cnts(slot)==0 marks an empty slot (occupied counts are ≥1)
      var slot = mix32(t) & mask
      while (cnts(slot) != 0 && keys(slot) != t) slot = (slot + 1) & mask
      if (cnts(slot) == 0) { keys(slot) = t; distinct += 1 }
      cnts(slot) += r
      if (cnts(slot) > top) top = cnts(slot)
    }

    def rowEnd(r: Int): Unit = {
      nDistinct(r) = distinct
      maxRun(r) = best
      topCnt(r) = top
    }
  }

  /** Profile every row of one chunk in its codec's wire format. */
  def chunkRowProfiles(codec: String, header: Array[Byte], data: Array[Byte],
                       offs: Array[Int], rows: Int): Profiles = {
    val sink = new ProfileSink(rows)
    ChunkWalker.walk(codec, header, data, offs, rows, sink)
    Profiles(sink.nTok, sink.nDistinct, sink.maxRun, sink.topCnt)
  }
}
