package graft.tools

import graft.encode.{EncodeJob, EncodeOptions}
import graft.format.TokenRow
import org.apache.spark.sql.SparkSession

/** A/B bucket count on the graded encode bench input. SCALE.md §1 sizes
  * `numBuckets ≈ totalTokens / (2–4 × maxTokensPerChunk)` — for the 384.7M-
  * token bench input that is ~192–384, yet the bench has used 64 since
  * round 1 (2 buckets per reduce task at local[32]: exactly the codec-cost
  * variance tail the 10× run exposed at 5 buckets/task). More buckets also
  * smooth the tail; too many shrink chunks below maxTokensPerChunk and cost
  * extra symbol-table trainings. Measured interleaved, min per cell.
  *
  * Run: sbt "runMain graft.tools.BucketsAB [rounds]"
  */
object BucketsAB {

  private def session(cpus: Int): SparkSession = {
    val maxPartitionBytes = math.max((1L << 30) / (4L * cpus), 16L << 20)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"buckets-ab-$cpus")
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes.toString)
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 3
    val path = "/tmp/graft_bench_input_2000000"
    val bucketCounts = Seq(64, 192, 384)
    val best = scala.collection.mutable.Map.empty[(Int, Int), Double].withDefaultValue(Double.MaxValue)
    val bytesOf = scala.collection.mutable.Map.empty[Int, Long]
    for (round <- 1 to rounds; cpus <- Seq(32, 8)) {
      val s = session(cpus)
      import s.implicits._
      val input = s.read.parquet(path).as[TokenRow]
      for (nb <- bucketCounts) {
        def run(): Double = {
          val t0 = System.nanoTime()
          val (_, b, _) = EncodeJob.sizeReport(EncodeJob.encode(input, EncodeOptions(numBuckets = nb)))
          bytesOf(nb) = b
          (System.nanoTime() - t0) / 1e9
        }
        if (round == 1) run()
        val sec = math.min(run(), run())
        if (sec < best((cpus, nb))) best((cpus, nb)) = sec
        println(f"round=$round cpus=$cpus buckets=$nb sec=$sec%.2f")
      }
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    println("--- min-based per bucket count ---")
    for (nb <- bucketCounts) {
      val t32 = best((32, nb))
      val t8 = best((8, nb))
      println(f"buckets=$nb t32=$t32%.2f t8=$t8%.2f eff=${t8 / (4 * t32)}%.3f bytes=${bytesOf(nb)}")
    }
  }
}
