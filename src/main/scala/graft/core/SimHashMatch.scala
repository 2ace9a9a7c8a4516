package graft.core

/** Compressed-domain SimHash: per-row 64-bit signatures computed by
  * streaming each codec's wire format through the unigram majority-vote
  * accumulator (ChunkWalker) — no decoded token array in the plan.
  *
  * Semantics are BIT-IDENTICAL to the decoded-domain expression
  * (pipeline/Expressions.scala SimHash64): per token t, h = mix64(t); bit b
  * of the signature is set iff Σ(±1 per token, + when bit b of h is set)
  * is > 0. Soak fuzzes every codec against that expression.
  *
  * RLE fold: a run of r equal tokens contributes ±r to every bit counter in
  * one step — one mix64 + 64 adds per RUN, not per token. Counters are Long
  * so a chunk-cap-sized row (512Ki tokens) can never overflow even through
  * the folded ±r steps.
  */
object SimHashMatch {
  import graft.pipeline.Hashing.mix64

  /** Unigram majority-vote accumulator for one chunk; reused across rows. */
  class SimAcc extends TokenSink {
    private val acc = new Array[Long](64)
    private var out = 0L

    def rowStart(row: Int, n: Int): Unit = java.util.Arrays.fill(acc, 0L)
    def rowEnd(row: Int): Unit = {
      var sig = 0L
      var b = 0
      while (b < 64) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
      out = sig
    }
    def feed(t: Int): Unit = addRun(t, 1L)
    override def feedRun(t: Int, r: Int): Unit = addRun(t, r.toLong)
    private def addRun(t: Int, r: Long): Unit = {
      val h = mix64(t.toLong)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += r else acc(b) -= r
        b += 1
      }
    }
    def sig: Long = out
  }

  /** Per-row 64-bit SimHash signatures for one whole chunk, in the codec's
    * compressed domain.
    */
  def chunkRowSigs(codec: String, header: Array[Byte], data: Array[Byte],
                   offs: Array[Int], rowCount: Int): Array[Long] = {
    val sigs = new Array[Long](rowCount)
    val acc = new SimAcc {
      override def rowEnd(row: Int): Unit = {
        super.rowEnd(row)
        sigs(row) = sig
      }
    }
    ChunkWalker.walk(codec, header, data, offs, rowCount, acc)
    sigs
  }
}
