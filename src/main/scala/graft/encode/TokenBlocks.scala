package graft.encode

import graft.core.{ByteReader, ByteWriter}
import graft.format.TokenRow
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Map-side combine blocks for the encode shuffle.
  *
  * A block carries many rows of ONE (bucket, source) group as one binary
  * cell: `varUInt(srcLen) srcUtf8 fixed32(nRows) { varUInt(idLen) idUtf8
  * varUInt(nTok) zigzag(tok)* }*`. Packing runs inside the map task, so the
  * shuffle moves a few thousand block rows of varint payload instead of
  * millions of UnsafeRows — the bytes-per-token lever for shuffle-bound
  * scaling (network on a real cluster, the shared memory bus at local[N]).
  * The (bucket, source) grouping the chunk builder needs is preserved
  * block-internally; the shuffle key stays the explicit bucket id.
  *
  * Allocation discipline (GC was the first regression seen at local[32]):
  * the pack loop materializes NO per-row objects — token arrays are walked
  * through ArrayData getters and doc ids are copied UTF8String→buffer via
  * writeToMemory; the only steady-state garbage is one byte[] per emitted
  * block (single-copy drain: the header is pre-written and the row count
  * patched at flush).
  */
object TokenBlocks {

  /** Flush threshold per (bucket, source) accumulator. Large enough to
    * amortize headers, small enough that per-task live memory stays bounded:
    * groups-per-task × threshold (≤ 320 groups × 256 KiB = 80 MiB worst
    * case on the 5-source fixture; real corpora have few sources per task).
    */
  private val BlockBytes = 256 << 10

  private final class Acc(val source: String) {
    val w = new ByteWriter(32 << 10)
    private val srcBytes = source.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    w.writeVarUInt(srcBytes.length)
    w.writeBytes(srcBytes, 0, srcBytes.length)
    private val nRowsAt = w.size
    w.writeFixed32(0) // patched in drain()
    var nRows = 0

    def addRow(id: UTF8String, toks: org.apache.spark.sql.catalyst.util.ArrayData): Unit = {
      val idLen = id.numBytes()
      w.writeVarUInt(idLen)
      id.writeToMemory(w.ensureRaw(idLen), Platform.BYTE_ARRAY_OFFSET + w.size)
      w.rawAdvance(idLen)
      val n = toks.numElements()
      w.writeVarUInt(n)
      var i = 0
      while (i < n) { w.writeZigZag(toks.getInt(i)); i += 1 }
      nRows += 1
    }

    def drain(): Array[Byte] = {
      w.patch32(nRowsAt, nRows)
      w.toBytes
    }
  }

  /** Shared pack state machine: per-(bucket, source) accumulators, source
    * interning, streaming flush at BlockBytes, sorted drain at end. Ingest
    * is pluggable (`nextUnit` pulls ONE row and calls `offer`).
    */
  private abstract class PackerBase extends Iterator[(Int, Array[Byte])] {
    // Source interning without per-row String allocation: distinct sources
    // per task are few, so a linear scan over stable UTF8String copies
    // beats hashing the (reused-buffer) row value. The interned INDEX
    // also forms the group key: (bucket << 20 | srcIdx) — collision-free.
    private val internedKeys = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    private val internedVals = scala.collection.mutable.ArrayBuffer.empty[String]
    private def internIdx(s: UTF8String): Int = {
      var i = 0
      while (i < internedKeys.length) {
        if (internedKeys(i).equals(s)) return i
        i += 1
      }
      val copy = s.toString
      internedKeys += UTF8String.fromString(copy)
      internedVals += copy
      require(internedKeys.length <= (1 << 20), "too many distinct sources in one task")
      internedKeys.length - 1
    }
    private val open = new java.util.HashMap[java.lang.Long, Acc]()
    private var drainIt: Iterator[java.lang.Long] = _
    private var ready: (Int, Array[Byte]) = _

    /** Ingest one row (call `offer`); false when input exhausted. */
    protected def nextUnit(): Boolean

    protected final def offer(bucket: Int, src: UTF8String, id: UTF8String,
                              toks: org.apache.spark.sql.catalyst.util.ArrayData): Unit = {
      val srcIdx = internIdx(src)
      val key = java.lang.Long.valueOf((bucket.toLong << 20) | srcIdx)
      var acc = open.get(key)
      if (acc == null) {
        acc = new Acc(internedVals(srcIdx))
        open.put(key, acc)
      }
      acc.addRow(id, toks)
      if (acc.w.size >= BlockBytes) {
        ready = (bucket, acc.drain())
        open.remove(key)
      }
    }

    private def advance(): Unit = {
      while (ready == null && nextUnit()) {}
      if (ready == null) {
        if (drainIt == null) {
          val keys = open.keySet().toArray(new Array[java.lang.Long](0))
          java.util.Arrays.sort(keys.asInstanceOf[Array[Object]])
          drainIt = keys.iterator
        }
        while (ready == null && drainIt.hasNext) {
          val key = drainIt.next()
          val acc = open.get(key)
          if (acc != null && acc.nRows > 0)
            ready = ((key.longValue >>> 20).toInt, acc.drain())
        }
      }
    }

    override final def hasNext: Boolean = {
      if (ready == null) advance()
      ready != null
    }
    override final def next(): (Int, Array[Byte]) = {
      if (!hasNext) throw new NoSuchElementException
      val b = ready
      ready = null
      b
    }
  }

  /** Map task: InternalRows (__bucket, doc_id, tokens, n_tok, source) →
    * (bucket, packedBlock) pairs. Streaming: a block is emitted the moment
    * its accumulator crosses BlockBytes, so live memory per task is bounded
    * by (open groups × BlockBytes), never by partition size.
    */
  def pack(it: Iterator[InternalRow]): Iterator[(Int, Array[Byte])] =
    new PackerBase {
      protected def nextUnit(): Boolean = {
        if (!it.hasNext) return false
        val r = it.next()
        offer(r.getInt(0), r.getUTF8String(4), r.getUTF8String(1), r.getArray(2))
        true
      }
    }

  /** Columnar map task: packs STRAIGHT from parquet ColumnarBatch vectors —
    * no ColumnarToRow per-row UnsafeRow materialization (~8 B/token of
    * memory traffic on the map side). The bucket is computed per row with
    * Buckets.of, bit-identical to the SQL expression (see Buckets).
    */
  def packColumnar(batches: Iterator[org.apache.spark.sql.vectorized.ColumnarBatch],
                   iDoc: Int, iTok: Int, iN: Int, iSrc: Int,
                   numBuckets: Int, saltBuckets: Int,
                   onlyBuckets: Option[Set[Int]] = None): Iterator[(Int, Array[Byte])] =
    new PackerBase {
      private var batch: org.apache.spark.sql.vectorized.ColumnarBatch = _
      private var row = 0
      protected def nextUnit(): Boolean = {
        while (batch == null || row >= batch.numRows()) {
          if (!batches.hasNext) return false
          batch = batches.next()
          row = 0
        }
        val doc = batch.column(iDoc).getUTF8String(row)
        val src = batch.column(iSrc).getUTF8String(row)
        val nTok = batch.column(iN).getInt(row)
        val bucket = Buckets.of(doc, nTok, src, numBuckets, saltBuckets)
        if (onlyBuckets.forall(_.contains(bucket))) {
          val toks = batch.column(iTok).getArray(row)
          offer(bucket, src, doc, toks)
        }
        row += 1
        true
      }
    }

  /** Little-endian fixed32 at the cursor (the patched nRows field). */
  def readFixed32(block: Array[Byte], rd: ByteReader): Int = {
    val v = (block(rd.pos) & 0xff) | ((block(rd.pos + 1) & 0xff) << 8) |
      ((block(rd.pos + 2) & 0xff) << 16) | ((block(rd.pos + 3) & 0xff) << 24)
    rd.pos += 4
    v
  }

  /** Reduce side: one packed block → its TokenRows (tests and tooling; the
    * shipped reduce path is BlockChunkIterator, which decodes straight into
    * GroupBuffers without these per-row allocations).
    */
  def unpack(bucket: Int, block: Array[Byte]): Iterator[(Int, TokenRow)] = {
    val rd = new ByteReader(block, 0, block.length)
    val srcLen = rd.readVarUInt()
    val source = new String(block, rd.pos, srcLen, java.nio.charset.StandardCharsets.UTF_8)
    rd.pos += srcLen
    val nRows = readFixed32(block, rd)
    new Iterator[(Int, TokenRow)] {
      private var i = 0
      override def hasNext: Boolean = i < nRows
      override def next(): (Int, TokenRow) = {
        val idLen = rd.readVarUInt()
        val id = new String(block, rd.pos, idLen, java.nio.charset.StandardCharsets.UTF_8)
        rd.pos += idLen
        val n = rd.readVarUInt()
        val toks = new Array[Int](n)
        var j = 0
        while (j < n) { toks(j) = rd.readZigZag(); j += 1 }
        i += 1
        (bucket, TokenRow(id, toks, n, source))
      }
    }
  }
}
