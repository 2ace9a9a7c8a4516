package graft.tools

import graft.encode.{EncodeJob, EncodeOptions}
import graft.format.TokenRow
import org.apache.spark.sql.SparkSession

/** A/B the remaining 8→32 scaling levers on the encode bench input
  * (NOTES_r4 §1): parquet file/row-group layout (64×13 MB baseline vs
  * 128×6.5 MB vs 32×26 MB big-row-group) × vectorized reader batch size
  * (4096 default vs 16384). All cells measured interleaved per round
  * (min-of-2 per cell per round, min across rounds reported) so host noise
  * windows hit every cell.
  *
  * Run: sbt "runMain graft.tools.ScanScaleAB [rounds]"
  */
object ScanScaleAB {

  private def session(cpus: Int, batch: Int): SparkSession = {
    val maxPartitionBytes = math.max((1L << 30) / (4L * cpus), 16L << 20)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"scan-scale-$cpus-$batch")
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes.toString)
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.parquet.columnarReaderBatchSize", batch.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 3
    val rows = 2000000L
    // (label, partitions, parquet block size)
    val layouts = Seq(("p64", 64, 128L << 20), ("p128", 128, 128L << 20),
      ("p32big", 32, 256L << 20))

    // generate any missing variant once (generation excluded from timing)
    {
      val s = session(32, 4096)
      for ((label, parts, block) <- layouts) {
        val path = s"/tmp/graft_scanab_${label}_$rows"
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
          graft.spark.SyntheticData.tokenTable(s, rows, parts)
            .write.option("parquet.block.size", block.toString)
            .mode("overwrite").parquet(path)
        }
      }
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    val best = scala.collection.mutable.Map.empty[(Int, Int, String), Double]
      .withDefaultValue(Double.MaxValue)
    for (round <- 1 to rounds; cpus <- Seq(32, 8); batch <- Seq(4096, 16384)) {
      val s = session(cpus, batch)
      import s.implicits._
      for ((label, _, _) <- layouts) {
        val input = s.read.parquet(s"/tmp/graft_scanab_${label}_$rows").as[TokenRow]
        def run(): Double = {
          val t0 = System.nanoTime()
          EncodeJob.sizeReport(EncodeJob.encode(input, EncodeOptions(numBuckets = 64)))
          (System.nanoTime() - t0) / 1e9
        }
        if (round == 1) run() // JIT/codegen warm per session shape
        val sec = math.min(run(), run())
        val k = (cpus, batch, label)
        if (sec < best(k)) best(k) = sec
        println(f"round=$round cpus=$cpus batch=$batch layout=$label sec=$sec%.2f")
      }
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    println("--- min-based eff(8->32) per cell ---")
    for (batch <- Seq(4096, 16384); (label, _, _) <- layouts) {
      val t32 = best((32, batch, label))
      val t8 = best((8, batch, label))
      println(f"batch=$batch layout=$label t32=$t32%.2f t8=$t8%.2f eff=${t8 / (4 * t32)}%.3f")
    }
  }
}
