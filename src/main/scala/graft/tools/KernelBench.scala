package graft.tools

import graft.core._
import graft.spark.SyntheticData

/** Pure-JVM kernel microbench: training / encode / decode / match throughput
  * per source distribution, no Spark. Run:
  *   sbt "runMain graft.tools.KernelBench"
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.nonEmpty) args(0).toInt else 20000
    // optional 2nd arg: force one codec on every source (e.g. "fsst" to
    // isolate the FSST decode kernel across distributions)
    val force = if (args.length > 1) Some(args(1)) else None
    val rows = (0L until nRows.toLong).map(SyntheticData.row)
    for (src <- Seq("zipf", "lowcard", "runs", "narrow", "skew")) {
      val rs: IndexedSeq[Array[Int]] = rows.filter(_.source == src).map(_.tokens)
      val totalToks = rs.map(_.length.toLong).sum
      var t0 = System.nanoTime()
      val stats = ChunkStats.compute(rs)
      val tStats = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val choice = force match {
        case Some(name) =>
          val c = Codecs.byName(name)
          CodecSelector.Choice(c, c.buildHeader(TokenRows.ofArrays(rs), stats), 0L)
        case None => CodecSelector.choose(rs, stats)
      }
      val tSel = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val header = choice.codec.buildHeader(rs, stats)
      val tTrain = (System.nanoTime() - t0) / 1e9
      val enc = choice.codec.encoder(header)
      val out = new ByteWriter(1 << 20)
      val offs = new Array[Int](rs.length + 1)
      t0 = System.nanoTime()
      rs.zipWithIndex.foreach { case (r, i) => enc.encode(r, out); offs(i + 1) = out.size }
      val tEnc = (System.nanoTime() - t0) / 1e9
      val data = out.toBytes
      val dec = choice.codec.decoder(header)
      var tDec = Double.MaxValue
      var sink = 0L
      for (_ <- 1 to 3) { // decode is allocation-light: best-of-3 steadies JIT
        t0 = System.nanoTime()
        var i = 0
        while (i < rs.length) { sink += dec.decode(data, offs(i), offs(i + 1)).length; i += 1 }
        tDec = math.min(tDec, (System.nanoTime() - t0) / 1e9)
      }
      require(sink > 0)
      println(f"$src%8s rows=${rs.length}%6d toks=$totalToks%9d codec=${choice.codec.name}%7s " +
        f"B/tok=${out.size.toDouble / totalToks}%.3f statsMtok/s=${totalToks / 1e6 / tStats}%7.1f " +
        f"selSec=$tSel%.2f trainSec=$tTrain%.2f encMtok/s=${totalToks / 1e6 / tEnc}%7.1f " +
        f"decMtok/s=${totalToks / 1e6 / tDec}%7.1f")
    }
  }
}
