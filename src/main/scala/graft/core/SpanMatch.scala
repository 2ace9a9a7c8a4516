package graft.core

/** Compressed-domain span blocks: each row's non-overlapping k-token blocks
  * hashed to 128 bits (two independent polynomial lanes, HashMatch's
  * constants and fold) by streaming the codec's wire format (ChunkWalker) —
  * no decoded token array, no materialized block-content arrays.
  *
  * The block key is a hash where the decoded path shuffles the exact 4k-byte
  * content; identical output barring a 128-bit collision (≈ m²/2^129 for m
  * distinct blocks — the same accepted bound as the exact-dedup content
  * hash, HashMatch's scaladoc). A trailing partial block (< k tokens) is
  * excluded, mirroring the decoded path's `size div k` arithmetic.
  */
object SpanMatch {
  import graft.pipeline.Hashing.mix64

  /** Fixed-width block splitter + two polynomial lanes for one chunk;
    * reused across rows (reset per row).
    */
  class BlockAcc(k: Int) extends TokenSink {
    private var h1 = 0L
    private var h2 = 0L
    private var cnt = 0
    private var hs1 = new Array[Long](16)
    private var hs2 = new Array[Long](16)
    private var nb = 0

    def rowStart(row: Int, n: Int): Unit = { h1 = 0L; h2 = 0L; cnt = 0; nb = 0 }

    def feed(t: Int): Unit = {
      h1 = h1 * HashMatch.B1 + mix64(t.toLong ^ 0x8cb92ba72f3d8dd7L)
      h2 = h2 * HashMatch.B2 + mix64(t.toLong ^ 0x589965cc75374cc3L)
      cnt += 1
      if (cnt == k) {
        if (nb == hs1.length) {
          hs1 = java.util.Arrays.copyOf(hs1, nb * 2)
          hs2 = java.util.Arrays.copyOf(hs2, nb * 2)
        }
        hs1(nb) = mix64(h1 ^ mix64(k.toLong ^ 0x8cb92ba72f3d8dd7L))
        hs2(nb) = mix64(h2 ^ mix64(k.toLong ^ 0x589965cc75374cc3L))
        nb += 1
        h1 = 0L; h2 = 0L; cnt = 0
      }
    }

    def rowEnd(row: Int): Unit = {} // trailing partial block dropped

    def blocks1(): Array[Long] = java.util.Arrays.copyOf(hs1, nb)
    def blocks2(): Array[Long] = java.util.Arrays.copyOf(hs2, nb)
  }

  /** Per-row block-hash lanes for one whole chunk, in the codec's
    * compressed domain. Row i's block b has key (l1(i)(b), l2(i)(b)).
    */
  def chunkRowBlocks(codec: String, header: Array[Byte], data: Array[Byte],
                     offs: Array[Int], rowCount: Int, k: Int)
      : (Array[Array[Long]], Array[Array[Long]]) = {
    val l1 = new Array[Array[Long]](rowCount)
    val l2 = new Array[Array[Long]](rowCount)
    val acc = new BlockAcc(k) {
      override def rowEnd(row: Int): Unit = {
        super.rowEnd(row)
        l1(row) = blocks1()
        l2(row) = blocks2()
      }
    }
    ChunkWalker.walk(codec, header, data, offs, rowCount, acc)
    (l1, l2)
  }
}
