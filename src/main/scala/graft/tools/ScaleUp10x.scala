package graft.tools

import graft.encode.{EncodeJob, EncodeOptions, ParquetTableIO, ResumableEncode}
import graft.format.TokenRow
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import scala.collection.mutable

/** Measured 10× scale-up point (round-4 verdict item 7): the full encode —
  * and a committed ResumableEncode + compressed scan — on 20M rows / ~3.85B
  * tokens, 10× the graded bench input, with per-stage straggler spread.
  * Backs the 100× extrapolations in SCALE.md with a measured decade.
  *
  * Run: sbt "runMain graft.tools.ScaleUp10x [rows]"
  */
object ScaleUp10x {

  private def session(cpus: Int): SparkSession = {
    val maxPartitionBytes = math.max((10L << 30) / (4L * cpus), 16L << 20)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaleup-$cpus")
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes.toString)
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 20000000L
    // default buckets keep the bench's rows-per-bucket ratio (2M rows / 64);
    // waves sized so buckets-per-wave ≥ 20× reduce parallelism (the SCALE.md
    // §7 smoothing lever: codec-cost variance averages out inside a task)
    val buckets = if (args.length > 1) args(1).toInt else (rows / 31250L).toInt
    val waves = if (args.length > 2) args(2).toInt else 4
    val inputPath = s"/tmp/graft_scaleup_input_$rows"
    val tablePath = s"/tmp/graft_scaleup_table_$rows"

    // generate once: same generator as the bench, 10× the files (640×~13MB)
    {
      val s = session(32)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(inputPath))) {
        graft.spark.SyntheticData.tokenTable(s, rows, (rows / 31250L).toInt)
          .write.mode("overwrite").parquet(inputPath)
      }
      fs.delete(new org.apache.hadoop.fs.Path(tablePath), true)
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    // pure encode at 8 and 32 threads (no write): the scaling pair at 10×
    val times = mutable.Map.empty[Int, Double]
    var toks = 0L
    var bytes = 0L
    for (cpus <- Seq(32, 8)) {
      val s = session(cpus)
      import s.implicits._
      val input = s.read.parquet(inputPath).as[TokenRow]
      def run(): Double = {
        val t0 = System.nanoTime()
        val (t, b, _) = EncodeJob.sizeReport(EncodeJob.encode(input, EncodeOptions(numBuckets = buckets)))
        toks = t; bytes = b
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm (JIT; at this size the warm run is also a page-cache load)
      times(cpus) = math.min(run(), run())
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    // committed resumable encode (write + manifest, 4 waves) + straggler
    // spread of every stage, then raw-vs-compressed scan over the table
    val s = session(32)
    import s.implicits._
    val stageTasks = mutable.HashMap.empty[Int, mutable.ArrayBuffer[Long]]
    s.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        val m = t.taskMetrics
        if (m != null)
          stageTasks.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) += m.executorRunTime
      }
    })
    val input = s.read.parquet(inputPath).as[TokenRow]
    val io = new ParquetTableIO(tablePath)
    val t0 = System.nanoTime()
    val committed = ResumableEncode.run(s, input, io, s"scaleup-$rows",
      EncodeOptions(numBuckets = buckets, waves = waves))
    val secWrite = (System.nanoTime() - t0) / 1e9
    val wToks = committed.map(_.tokens).sum
    val wBytes = committed.map(_.bytes).sum

    // straggler spread per encode-path stage (tasks>=8: skip driver-ish ones)
    val spread = stageTasks.toSeq.sortBy(_._1).filter(_._2.length >= 8).map { case (sid, ts) =>
      val sorted = ts.sorted
      val med = sorted(sorted.length / 2) / 1e3
      val max = sorted.last / 1e3
      f"stage$sid:${ts.length}tasks med=$med%.1fs max=$max%.1fs"
    }

    val chunks = s.read.parquet(s"$tablePath/chunks")
    val pat = (0 until 64).map(graft.spark.SyntheticData.hotPhrase).maxBy(_.length).toSeq
    def best(f: => Long): (Long, Double) = {
      f
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
      }.minBy(_._2)
    }
    val (nCmp, tCmp) = best(
      graft.query.Graft.scanPattern(chunks, graft.core.PatternMode.Contains, Seq(pat)).count())
    val (nRaw, tRaw) = best(
      s.read.parquet(inputPath)
        .filter(graft.query.Graft.containsTokens(col("tokens"), pat)).count())
    require(nCmp == nRaw, s"scan disagreement at 10x: $nCmp vs $nRaw")

    val t32 = times(32)
    val t8 = times(8)
    println(f"""{"rows":$rows,"buckets":$buckets,"waves":$waves,"tokens":$toks,"bytes":$bytes,"bytes_per_token":${bytes.toDouble / toks}%.4f,"sec_local32":$t32%.2f,"sec_local8":$t8%.2f,"tokens_per_sec_local32":${(toks / t32).toLong},"eff_8_to_32":${t8 / (4 * t32)}%.3f,"resumable_write_sec":$secWrite%.2f,"resumable_tokens":$wToks,"resumable_bytes_per_token":${wBytes.toDouble / math.max(wToks, 1)}%.4f,"buckets_committed":${committed.length},"scan_matches":$nCmp,"sec_compressed_scan":$tCmp%.2f,"sec_raw_scan":$tRaw%.2f}""")
    spread.foreach(println)
    s.stop()
  }
}
