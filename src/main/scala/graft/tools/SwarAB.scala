package graft.tools

import graft.core._
import graft.spark.SyntheticData

/** Interleaved A/B of the FSST decoder's escape-segment scan: byte-wise
  * memchr loop vs SWAR word scan (Swar.indexOfFF), measured over the same
  * fsst-encoded corpus with per-lap interleaving (the same discipline as
  * Bench's pattern variants — warm laps first, min per variant).
  * Also prints per-source escape density, the variable that decides which
  * scan wins (SWAR pays off only when escape-free segments span words).
  */
object SwarAB {

  private def indexOfFFByte(bytes: Array[Byte], from: Int, to: Int): Int = {
    var i = from
    while (i < to && bytes(i) != -1) i += 1
    i
  }

  def main(args: Array[String]): Unit = {
    val nRows = if (args.nonEmpty) args(0).toInt else 100000
    val rows = (0L until nRows.toLong).map(SyntheticData.row)
    for (src <- Seq("zipf", "lowcard", "runs", "narrow", "skew")) {
      val rs: IndexedSeq[Array[Int]] = rows.filter(_.source == src).map(_.tokens)
      val totalToks = rs.map(_.length.toLong).sum
      val stats = ChunkStats.compute(rs)
      val header = FsstTokenCodec.buildHeader(TokenRows.ofArrays(rs), stats)
      val enc = FsstTokenCodec.encoder(header)
      val out = new ByteWriter(1 << 20)
      val offs = new Array[Int](rs.length + 1)
      rs.zipWithIndex.foreach { case (r, i) => enc.encode(r, out); offs(i + 1) = out.size }
      val data = out.toBytes
      val escPerTok = enc.escapeCount.toDouble / totalToks
      // segment-scan only (isolates the scan from symbol expansion): walk
      // every row's byte stream segment by segment, as decode does
      def scanAll(f: (Array[Byte], Int, Int) => Int): Long = {
        var segs = 0L
        var r = 0
        while (r < rs.length) {
          var pos = offs(r)
          val to = offs(r + 1)
          // skip the varuint row header like decode does
          while ((data(pos) & 0x80) != 0) pos += 1
          pos += 1
          while (pos < to) {
            val seg = f(data, pos, to)
            segs += 1
            pos = seg + (if (seg < to) 2 else 0) // skip marker + 1 varint byte min
          }
          r += 1
        }
        segs
      }
      val variants: Seq[(String, () => Long)] = Seq(
        "byte" -> (() => scanAll(indexOfFFByte)),
        "swar" -> (() => scanAll(Swar.indexOfFF)))
      val times = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
      var sink = 0L
      for (lap <- 1 to 8; (name, f) <- variants) {
        val t0 = System.nanoTime()
        sink += f()
        val sec = (System.nanoTime() - t0) / 1e9
        if (lap > 3 && sec < times(name)) times(name) = sec
      }
      require(sink > 0)
      // full decode with the live decoder (uses Swar) for context
      val dec = FsstTokenCodec.decoder(header)
      var tDec = Double.MaxValue
      for (_ <- 1 to 5) {
        val t0 = System.nanoTime()
        var i = 0
        var s = 0L
        while (i < rs.length) { s += dec.decode(data, offs(i), offs(i + 1)).length; i += 1 }
        require(s == totalToks)
        tDec = math.min(tDec, (System.nanoTime() - t0) / 1e9)
      }
      val mb = data.length / 1e6
      println(f"$src%8s bytes=${data.length}%9d esc/tok=$escPerTok%.3f " +
        f"scanByte=${mb / times("byte")}%7.0f MB/s scanSwar=${mb / times("swar")}%7.0f MB/s " +
        f"decode=${totalToks / 1e6 / tDec}%6.1f Mtok/s")
    }
  }
}
