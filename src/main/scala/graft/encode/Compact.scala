package graft.encode

import graft.core._
import graft.format.{ChunkOps, ChunkStatsRow, EncodedChunk, Offsets}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

import scala.collection.mutable.ArrayBuffer

/** Compressed-domain chunk COMPACTION: merge small sibling chunks into
  * target-sized ones WITHOUT decoding — the small-file maintenance pass of a
  * managed-table layout (the 10^12-sequence story: streaming micro-batches,
  * rescued stragglers, and fine-grained resume waves all leave sub-target
  * chunks behind; at scale the file count, not the byte count, becomes the
  * planning bottleneck).
  *
  * Why byte-splicing is sound here:
  *   - every per-row payload is self-contained (varUInt(n) prefix + codec
  *     bytes) and references only the chunk HEADER, so two chunks with
  *     byte-identical headers concatenate by plane: `data` appends, the
  *     delta-varint `offsets` plane IS the row-length sequence (appending
  *     preserves it), and the packed `doc_ids` plane appends;
  *   - FSST siblings share header bytes BY CONSTRUCTION — the encode reduce
  *     trains one symbol table per (bucket, source) group and reuses it for
  *     every chunk of the group (ChunkOps.build's fsstHeaderCache) — so the
  *     dominant codec compacts as a pure splice within one run; ACROSS runs
  *     (streaming micro-batches train per-batch tables) fsst members
  *     transcode onto the head member's table, which is canonical by the
  *     definition of greedy-encode-under-a-given-header (see packFsst);
  *   - RLE/raw headers are empty; FoR/bitpack headers are one width byte:
  *     equal widths splice, unequal widths re-pack the narrower members at
  *     the group-maximum width in the PACKED domain (FoR's per-row zigzag
  *     base copies through untouched). The max width is canonical — the
  *     fresh-encode width is bitsFor(max row range / max token), and
  *     bitsFor∘max = max∘bitsFor — so equality pushdown's canonical-byte
  *     compare stays sound;
  *   - DICT chunks merge in the INDEX domain even when their dictionaries
  *     differ: the merged dictionary is the sorted distinct union (exact,
  *     because per-chunk dictionaries are the chunks' exact distinct sets),
  *     and each row re-packs old-index → union-index at the union width.
  *     That equals a fresh canonical dict encode of the concatenated rows,
  *     so equality/range/set pushdown stays sound on compacted chunks.
  *
  * Chunks already at target size pass through untouched (same crc). Stats
  * merge conservatively (zone maps min/max, blooms OR, escape counts sum;
  * the distinct estimate sums as an upper bound — it is a selector input,
  * not a correctness input; the dict path's is exact). Group materialization
  * is bounded by one (bucket, source, codec) group's bytes — the unit a
  * single encode reduce task already buffered when it wrote them.
  */
object Compact {

  /** NOTE: `chunks` is referenced twice in the returned plan (pass-through
    * branch + debris branch); callers whose input is not a cheap re-scannable
    * source (cache / parquet) should pin it first (localCheckpoint).
    */
  def compact(chunks: DataFrame, targetTokens: Long = 1L << 19,
              maxRows: Int = 65536): Dataset[EncodedChunk] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    // A chunk strictly over either target can never pack with a sibling
    // (any addition overflows the greedy bound), so compactGroup would emit
    // it as an untouched singleton — route those around the groupByKey
    // shuffle entirely and shuffle only sub-target debris (round-5 verdict
    // #4; guide §2.3: don't move bytes whose placement is already decided).
    // At-target chunks dominate a maintained table's bytes, so the shuffle
    // and its per-chunk object (de)serialization now scale with the DEBRIS
    // fraction, not the table.
    val atTarget = col("n_tokens") > targetTokens || col("row_count") > maxRows
    // project to the chunk schema: inputs may carry extra columns (e.g. the
    // streaming commit id), which the debris branch's encoder drops anyway
    val chunkCols = org.apache.spark.sql.Encoders.product[EncodedChunk]
      .schema.fieldNames.toIndexedSeq.map(col)
    val pass = chunks.filter(atTarget).select(chunkCols: _*)
    val debris = chunks.filter(!atTarget).as[EncodedChunk]
      .groupByKey(c => (c.part_id, c.source, c.codec))
      .flatMapGroups((_: (Int, String, String), it: Iterator[EncodedChunk]) =>
        compactGroup(it.toIndexedSeq, targetTokens, maxRows).iterator)
    pass.unionByName(debris.toDF()).as[EncodedChunk]
  }

  /** Compact one (part, source, codec) group. Deterministic: members sort by
    * (chunk_id, first_doc_id) before packing.
    */
  def compactGroup(group: IndexedSeq[EncodedChunk], targetTokens: Long,
                   maxRows: Int): Seq[EncodedChunk] = {
    val sorted = group.sortBy(c => (c.chunk_id, c.first_doc_id))
    if (sorted.isEmpty) return Nil
    sorted.head.codec match {
      case "dict" => packDict(sorted, targetTokens, maxRows)
      case "for" | "bitpack" => packWidths(sorted, targetTokens, maxRows)
      case "fsst" => packFsst(sorted, targetTokens, maxRows)
      case _ =>
        // rle/raw headers are empty — everything splices
        sorted.groupBy(c => scala.collection.immutable.ArraySeq.unsafeWrapArray(c.symtab))
          .toSeq.sortBy(_._2.head.chunk_id)
          .flatMap { case (_, same) => packSplice(same, targetTokens, maxRows) }
    }
  }

  /** FSST chunks: header-identical members byte-splice (siblings of one
    * encode run share their symbol table via the reduce's header cache);
    * cross-header members — the cross-batch debris of a streaming ingest,
    * where every micro-batch trains its own table — TRANSCODE: their rows
    * decode and re-encode greedily under the HEAD member's table. Greedy
    * encode under a given header is the canonical form equality pushdown
    * memcmps against, so the merged chunk stays sound; escapes cover any
    * token the head's table lacks (compression may give back a little on
    * transcoded rows — chunks that are already at target never enter).
    */
  private def packFsst(cs: IndexedSeq[EncodedChunk], targetTokens: Long,
                       maxRows: Int): Seq[EncodedChunk] = {
    val out = ArrayBuffer.empty[EncodedChunk]
    val pend = ArrayBuffer.empty[EncodedChunk]
    var toks = 0L
    var rows = 0L
    def flush(): Unit = {
      if (pend.isEmpty) ()
      else if (pend.length == 1) out += pend.head
      else if (pend.forall(c => java.util.Arrays.equals(c.symtab, pend.head.symtab)))
        out += splice(pend.toIndexedSeq)
      else out += transcodeFsst(pend.toIndexedSeq)
      pend.clear(); toks = 0L; rows = 0L
    }
    for (c <- cs) {
      if (pend.nonEmpty &&
        (toks + c.n_tokens > targetTokens || rows + c.row_count > maxRows)) flush()
      pend += c; toks += c.n_tokens; rows += c.row_count
    }
    flush()
    out.toSeq
  }

  private def transcodeFsst(cs: IndexedSeq[EncodedChunk]): EncodedChunk = {
    val head = cs.head
    val data = new ByteWriter(cs.iterator.map(_.data.length).sum + 64)
    val ids = new ByteWriter(cs.iterator.map(_.doc_ids.length).sum)
    val ends = ArrayBuffer.empty[Int]
    val enc = FsstTokenCodec.encoder(head.symtab)
    var rowCount = 0L
    var nTokens = 0L
    for (c <- cs) {
      val offs = Offsets.unpack(c.offsets, c.row_count)
      if (java.util.Arrays.equals(c.symtab, head.symtab)) {
        val base = data.size
        data.writeBytes(c.data, 0, c.data.length)
        var row = 0
        while (row < c.row_count) { ends += base + offs(row + 1); row += 1 }
      } else {
        val dec = FsstTokenCodec.decoder(c.symtab)
        var row = 0
        while (row < c.row_count) {
          enc.encode(dec.decode(c.data, offs(row), offs(row + 1)), data)
          ends += data.size
          row += 1
        }
      }
      ids.writeBytes(c.doc_ids, 0, c.doc_ids.length)
      rowCount += c.row_count
      nTokens += c.n_tokens
    }
    val d = data.toBytes; val i = ids.toBytes
    val o = Offsets.pack(ends.toArray)
    // value-level stats merge as usual; escape stats come from the members
    // whose bytes spliced through (incl. head) plus the transcoding encoder
    val st = mergeStats(cs.filter(c => java.util.Arrays.equals(c.symtab, head.symtab)))
    val stAll = mergeStats(cs)
    val escBloom = new Array[Byte](ChunkStats.BloomBytes)
    var bi = 0
    while (bi < escBloom.length) {
      escBloom(bi) = (st.escaped_bitmap(bi) |
        (if (enc.escapedBloom == null) 0 else enc.escapedBloom(bi))).toByte
      bi += 1
    }
    head.copy(
      data = d, offsets = o, doc_ids = i,
      row_count = rowCount.toInt, n_tokens = nTokens,
      stats = stAll.copy(escape_cnt = st.escape_cnt + enc.escapeCount,
        escaped_bitmap = escBloom),
      crc = ChunkOps.chunkCrc(d, head.symtab, o, i))
  }

  /** Greedy packing of header-identical chunks; singletons pass through. */
  private def packSplice(cs: IndexedSeq[EncodedChunk], targetTokens: Long,
                         maxRows: Int): Seq[EncodedChunk] = {
    val out = ArrayBuffer.empty[EncodedChunk]
    val pend = ArrayBuffer.empty[EncodedChunk]
    var toks = 0L
    var rows = 0L
    def flush(): Unit = {
      if (pend.isEmpty) ()
      else if (pend.length == 1) out += pend.head // untouched, same crc
      else out += splice(pend.toIndexedSeq)
      pend.clear(); toks = 0L; rows = 0L
    }
    for (c <- cs) {
      if (pend.nonEmpty &&
        (toks + c.n_tokens > targetTokens || rows + c.row_count > maxRows)) flush()
      pend += c; toks += c.n_tokens; rows += c.row_count
    }
    flush()
    out.toSeq
  }

  private def splice(cs: IndexedSeq[EncodedChunk]): EncodedChunk = {
    val head = cs.head
    val data = new ByteWriter(cs.iterator.map(_.data.length).sum)
    val offs = new ByteWriter(cs.iterator.map(_.offsets.length).sum)
    val ids = new ByteWriter(cs.iterator.map(_.doc_ids.length).sum)
    var rowCount = 0L
    var nTokens = 0L
    for (c <- cs) {
      data.writeBytes(c.data, 0, c.data.length)
      offs.writeBytes(c.offsets, 0, c.offsets.length)
      ids.writeBytes(c.doc_ids, 0, c.doc_ids.length)
      rowCount += c.row_count
      nTokens += c.n_tokens
    }
    val d = data.toBytes; val o = offs.toBytes; val i = ids.toBytes
    head.copy(
      data = d, offsets = o, doc_ids = i,
      row_count = rowCount.toInt, n_tokens = nTokens,
      stats = mergeStats(cs),
      crc = ChunkOps.chunkCrc(d, head.symtab, o, i))
  }

  private def mergeStats(cs: IndexedSeq[EncodedChunk]): ChunkStatsRow = {
    val bloom = new Array[Byte](ChunkStats.BloomBytes)
    val escaped = new Array[Byte](ChunkStats.BloomBytes)
    var minT = Int.MaxValue; var maxT = Int.MinValue
    var maxRun = 0; var esc = 0L; var dist = 0L
    for (c <- cs) {
      val s = c.stats
      if (s.min_tok < minT) minT = s.min_tok
      if (s.max_tok > maxT) maxT = s.max_tok
      if (s.max_run > maxRun) maxRun = s.max_run
      esc += s.escape_cnt
      dist += s.distinct_est // upper bound; selector input only
      var i = 0
      while (i < bloom.length) {
        bloom(i) = (bloom(i) | s.symbol_bitmap(i)).toByte
        escaped(i) = (escaped(i) | s.escaped_bitmap(i)).toByte
        i += 1
      }
    }
    ChunkStatsRow(dist, minT, maxT, maxRun, esc, bloom, escaped)
  }

  /** FoR/bitpack chunks merge across DIFFERENT widths: the merged width is
    * the member maximum, which is CANONICAL — the fresh-encode width is
    * bitsFor(max row range / max token) and bitsFor∘max = max∘bitsFor — so
    * equality pushdown's canonical-byte compare stays sound. Equal-width
    * runs splice; narrower members repack their packed values (FoR: the
    * per-row zigzag base copies through, only the delta plane re-packs) in
    * the packed domain, never materializing tokens.
    */
  private def packWidths(cs: IndexedSeq[EncodedChunk], targetTokens: Long,
                         maxRows: Int): Seq[EncodedChunk] = {
    val out = ArrayBuffer.empty[EncodedChunk]
    val pend = ArrayBuffer.empty[EncodedChunk]
    var toks = 0L
    var rows = 0L
    def flush(): Unit = {
      if (pend.isEmpty) ()
      else if (pend.length == 1) out += pend.head
      else {
        val w = pend.iterator.map(c => c.symtab(0) & 0xff).max
        if (pend.forall(c => (c.symtab(0) & 0xff) == w)) out += splice(pend.toIndexedSeq)
        else out += repackWidths(pend.toIndexedSeq, w)
      }
      pend.clear(); toks = 0L; rows = 0L
    }
    for (c <- cs) {
      if (pend.nonEmpty &&
        (toks + c.n_tokens > targetTokens || rows + c.row_count > maxRows)) flush()
      pend += c; toks += c.n_tokens; rows += c.row_count
    }
    flush()
    out.toSeq
  }

  private def repackWidths(cs: IndexedSeq[EncodedChunk], newW: Int): EncodedChunk = {
    val head = cs.head
    val isFor = head.codec == "for"
    val data = new ByteWriter(cs.iterator.map(_.data.length).sum + 64)
    val ids = new ByteWriter(cs.iterator.map(_.doc_ids.length).sum)
    val ends = ArrayBuffer.empty[Int]
    var rowCount = 0L
    var nTokens = 0L
    for (c <- cs) {
      val oldW = c.symtab(0) & 0xff
      val offs = Offsets.unpack(c.offsets, c.row_count)
      if (oldW == newW) {
        // width already right: rows splice through untouched
        val base = data.size
        data.writeBytes(c.data, 0, c.data.length)
        var row = 0
        while (row < c.row_count) { ends += base + offs(row + 1); row += 1 }
      } else {
        var row = 0
        while (row < c.row_count) {
          val r = new ByteReader(c.data, offs(row), offs(row + 1))
          val n = r.readVarUInt()
          data.writeVarUInt(n)
          if (n > 0 && isFor) data.writeZigZag(r.readZigZag()) // per-row base
          if (n > 0) {
            val vals = BitPack.unpack(c.data, r.pos, n, oldW, v => v)
            BitPack.pack(vals, 0, n, v => v, newW, data)
          }
          ends += data.size
          row += 1
        }
      }
      ids.writeBytes(c.doc_ids, 0, c.doc_ids.length)
      rowCount += c.row_count
      nTokens += c.n_tokens
    }
    val header = Array[Byte](newW.toByte)
    val d = data.toBytes; val i = ids.toBytes
    val o = Offsets.pack(ends.toArray)
    head.copy(
      symtab = header, data = d, offsets = o, doc_ids = i,
      row_count = rowCount.toInt, n_tokens = nTokens,
      stats = mergeStats(cs),
      crc = ChunkOps.chunkCrc(d, header, o, i))
  }

  /** Dict chunks merge across DIFFERENT dictionaries: greedy packing bounded
    * by token/row targets AND the union dictionary staying within MaxCard;
    * each packed group re-normalizes to the sorted distinct union and rows
    * re-pack old-index → union-index at the union width (index domain — no
    * token array ever materializes).
    */
  private def packDict(cs: IndexedSeq[EncodedChunk], targetTokens: Long,
                       maxRows: Int): Seq[EncodedChunk] = {
    val out = ArrayBuffer.empty[EncodedChunk]
    val pend = ArrayBuffer.empty[(EncodedChunk, Array[Int])]
    var union = Array.emptyIntArray
    var toks = 0L
    var rows = 0L
    def flush(): Unit = {
      if (pend.isEmpty) ()
      else if (pend.length == 1) out += pend.head._1
      else out += mergeDict(pend.toIndexedSeq.map(_._1), union)
      pend.clear(); union = Array.emptyIntArray; toks = 0L; rows = 0L
    }
    for (c <- cs) {
      val dict = DictCodec.readDict(c.symtab)
      val u = mergeSorted(union, dict)
      if (pend.nonEmpty && (u.length > DictCodec.MaxCard ||
        toks + c.n_tokens > targetTokens || rows + c.row_count > maxRows)) flush()
      union = if (pend.isEmpty) dict else u
      pend += ((c, dict)); toks += c.n_tokens; rows += c.row_count
    }
    flush()
    out.toSeq
  }

  /** Union of two sorted-distinct arrays, sorted distinct. */
  private def mergeSorted(a: Array[Int], b: Array[Int]): Array[Int] = {
    val out = new Array[Int](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) { out(k) = a(i); i += 1 }
      else if (b(j) < a(i)) { out(k) = b(j); j += 1 }
      else { out(k) = a(i); i += 1; j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    java.util.Arrays.copyOf(out, k)
  }

  private def mergeDict(cs: IndexedSeq[EncodedChunk], union: Array[Int]): EncodedChunk = {
    val header = {
      val w = new ByteWriter(union.length * 2 + 8)
      w.writeVarUInt(union.length)
      var j = 0
      while (j < union.length) { w.writeZigZag(union(j)); j += 1 }
      w.toBytes
    }
    val newW = BitPack.bitsFor(math.max(union.length - 1, 0))
    val data = new ByteWriter(cs.iterator.map(_.data.length).sum)
    val ids = new ByteWriter(cs.iterator.map(_.doc_ids.length).sum)
    val ends = ArrayBuffer.empty[Int]
    var rowCount = 0L
    var nTokens = 0L
    for (c <- cs) {
      val dict = DictCodec.readDict(c.symtab)
      val idxMap = dict.map(v => java.util.Arrays.binarySearch(union, v))
      val oldW = BitPack.bitsFor(math.max(dict.length - 1, 0))
      val offs = Offsets.unpack(c.offsets, c.row_count)
      var row = 0
      while (row < c.row_count) {
        val r = new ByteReader(c.data, offs(row), offs(row + 1))
        val n = r.readVarUInt()
        data.writeVarUInt(n)
        val idx = BitPack.unpack(c.data, r.pos, n, oldW, k => idxMap(k))
        BitPack.pack(idx, 0, n, k => k, newW, data)
        ends += data.size
        row += 1
      }
      ids.writeBytes(c.doc_ids, 0, c.doc_ids.length)
      rowCount += c.row_count
      nTokens += c.n_tokens
    }
    val d = data.toBytes; val i = ids.toBytes
    val o = Offsets.pack(ends.toArray)
    val st = mergeStats(cs)
    cs.head.copy(
      symtab = header, data = d, offsets = o, doc_ids = i,
      row_count = rowCount.toInt, n_tokens = nTokens,
      stats = st.copy(distinct_est = union.length.toLong), // exact for dict
      crc = ChunkOps.chunkCrc(d, header, o, i))
  }
}
