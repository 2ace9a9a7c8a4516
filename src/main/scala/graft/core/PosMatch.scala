package graft.core

/** Per-row FIRST POSITION of a target token over one encoded chunk —
  * `array_position(tokens, t)` off compressed storage (1-based; 0 when the
  * document does not contain the token). The split-point discovery primitive:
  * where is the first EOS / separator / special token of every document, for
  * segmentation, prompt/response splitting, and truncate-at-sentinel
  * pipelines, without decoding a single token array.
  *
  * Implementation: each codec's wire format streams through ChunkWalker with
  * a run-aware sink — an RLE run of r equal tokens resolves in ONE fold (the
  * first position inside a matching run is its start), and a constant packed
  * row (width 0) likewise. The zone-map + bloom chunk gate lives in the
  * caller (TokenPosGenerator): a chunk that cannot contain the target emits
  * its rows at metadata cost (id slab + one varint per row) with pos = 0.
  */
object PosMatch {

  private final class PosSink(target: Int, poss: Array[Int],
                              nToks: Array[Int]) extends TokenSink {
    private var cnt = 0
    private var hit = 0
    def rowStart(row: Int, n: Int): Unit = { cnt = 0; hit = 0; nToks(row) = n }
    def feed(t: Int): Unit = { cnt += 1; if (hit == 0 && t == target) hit = cnt }
    override def feedRun(t: Int, r: Int): Unit = {
      if (hit == 0 && t == target) hit = cnt + 1
      cnt += r
    }
    def rowEnd(row: Int): Unit = poss(row) = hit
  }

  /** (positions, nToks), one entry per row; positions are 1-based, 0 = absent. */
  def chunkFirstPositions(codec: String, header: Array[Byte], data: Array[Byte],
                          offs: Array[Int], rows: Int,
                          target: Int): (Array[Int], Array[Int]) = {
    val poss = new Array[Int](rows)
    val nToks = new Array[Int](rows)
    ChunkWalker.walk(codec, header, data, offs, rows, new PosSink(target, poss, nToks))
    (poss, nToks)
  }
}
