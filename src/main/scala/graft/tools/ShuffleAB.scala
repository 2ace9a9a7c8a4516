package graft.tools

import graft.encode.{EncodeJob, EncodeOptions}
import graft.format.TokenRow
import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the encode shuffle modes (blocks vs rows) across
  * parallelism levels, Bench-methodology (per-round pairing so a host-noise
  * window hits both modes): sbt "runMain graft.tools.ShuffleAB <path> [rounds]"
  */
object ShuffleAB {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"ab-$cpus")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .config("spark.shuffle.compress", sys.env.getOrElse("GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress", sys.env.getOrElse("GRAFT_SHUFFLE_COMPRESS", "true"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val path = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 4
    val levels = Seq(32, 8, 2)
    val modes = Seq("blocks", "rows")
    val results = scala.collection.mutable.Map.empty[(String, Int), List[Double]]
      .withDefaultValue(Nil)

    for (round <- 0 to rounds) { // round 0 = warm-up, discarded
      for (cpus <- levels; mode <- modes) {
        sys.props("graft.shuffle.mode") = mode
        val spark = session(cpus)
        import spark.implicits._
        val input = spark.read.parquet(path).as[TokenRow]
        val t0 = System.nanoTime()
        EncodeJob.sizeReport(EncodeJob.encode(input, EncodeOptions(numBuckets = 64)))
        val sec = (System.nanoTime() - t0) / 1e9
        if (round > 0) results((mode, cpus)) = sec :: results((mode, cpus))
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }
    def med(xs: List[Double]): Double = xs.sorted.apply(xs.length / 2)
    for (mode <- modes; cpus <- levels) {
      val xs = results((mode, cpus))
      println(f"mode=$mode%-7s cpus=$cpus%2d median=${med(xs)}%6.2f s min=${xs.min}%6.2f s all=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    for (mode <- modes) {
      val e28 = med(results((mode, 2))) / (4 * med(results((mode, 8))))
      val e832 = med(results((mode, 8))) / (4 * med(results((mode, 32))))
      println(f"mode=$mode%-7s eff(2->8)=$e28%.3f eff(8->32)=$e832%.3f")
    }
  }
}
