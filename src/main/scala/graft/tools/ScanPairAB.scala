package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Interleaved raw-vs-compressed contains-scan A/B over existing artifacts
  * (e.g. the ScaleUp10x input + chunk table), isolating the scan comparison
  * from the encode phases that precede it inside ScaleUp10x — page-cache
  * state right after a 13 GB chunk write favors whichever side was touched
  * last, so this tool warms BOTH sides once, then interleaves timed laps.
  *
  * Run: sbt "runMain graft.tools.ScanPairAB <inputPath> <chunksPath> [laps]"
  */
object ScanPairAB {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScanPairAB <inputPath> <chunksPath> [laps]")
    val (inputPath, chunksPath) = (args(0), args(1))
    val laps = if (args.length > 2) args(2).toInt else 3
    val mpb = sys.env.getOrElse("SPARK_GRAFT_MPB", (128L << 20).toString)
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-scanpair")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", mpb)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-stage task-runtime spread: max/med >> 1 inside ONE run is the
    // skew signature, readable even when absolute times are noise-inflated
    val stageTasks = scala.collection.mutable.HashMap.empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = synchronized {
        val m = t.taskMetrics
        if (m != null)
          stageTasks.getOrElseUpdate(t.stageId, scala.collection.mutable.ArrayBuffer.empty) += m.executorRunTime
      }
    })
    val input = spark.read.parquet(inputPath)
    val chunks = spark.read.parquet(chunksPath)
    val pat = (0 until 64).map(graft.spark.SyntheticData.hotPhrase).maxBy(_.length).toSeq
    val variants: Seq[(String, () => Long)] = Seq(
      "raw" -> (() => input.filter(graft.query.Graft.containsTokens(col("tokens"), pat)).count()),
      "cmp" -> (() => graft.query.Graft.scanPattern(chunks,
        graft.core.PatternMode.Contains, Seq(pat)).count()))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    val best = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    val all = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (lap <- 0 to laps; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val n = f()
      val sec = (System.nanoTime() - t0) / 1e9
      counts(name) = n
      if (lap > 0) { // lap 0 = warm both sides
        all(name) = sec :: all(name)
        if (sec < best(name)) best(name) = sec
      }
    }
    require(counts("raw") == counts("cmp"), s"scan disagreement: $counts")
    def fmt(xs: List[Double]) = xs.reverse.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(f"""{"matches":${counts("raw")},"sec_raw_scan":${best("raw")}%.2f,"sec_compressed_scan":${best("cmp")}%.2f,"raw_laps":${fmt(all("raw"))},"cmp_laps":${fmt(all("cmp"))}}""")
    stageTasks.toSeq.sortBy(_._1).filter(_._2.length >= 16).foreach { case (sid, ts) =>
      val sorted = ts.sorted
      println(f"stage$sid:${ts.length}tasks med=${sorted(sorted.length / 2) / 1e3}%.1fs max=${sorted.last / 1e3}%.1fs sum=${ts.sum / 1e3}%.0fs")
    }
    spark.stop()
  }
}
