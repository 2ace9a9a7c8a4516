package graft.tools

import graft.core._
import graft.spark.SyntheticData

/** Sweep (sample size, generations) → compression ratio + training cost for
  * the FSST trainer on the phrase-injected corpora.
  */
object TrainTune {
  def main(args: Array[String]): Unit = {
    val rows: IndexedSeq[Array[Int]] =
      (0L until 20000L).map(SyntheticData.row).filter(r => r.source == "zipf" || r.source == "skew").map(_.tokens)
    val toks = rows.map(_.length.toLong).sum
    for (sample <- Seq(1 << 13, 1 << 14, 1 << 15, 1 << 16); gens <- Seq(3, 5, 7)) {
      val t0 = System.nanoTime()
      val st = FsstTrainer.train(rows, sample, gens)
      val trainSec = (System.nanoTime() - t0) / 1e9
      val enc = FsstTokenCodec.encoder(st.toBytes)
      val out = new ByteWriter(1 << 20)
      rows.foreach(enc.encode(_, out))
      println(f"sample=${sample}%6d gens=$gens B/tok=${(out.size + st.toBytes.length).toDouble / toks}%.4f trainSec=$trainSec%.3f")
    }
  }
}
