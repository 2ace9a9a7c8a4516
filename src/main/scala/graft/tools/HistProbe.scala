package graft.tools

import graft.query.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved min-of-N for the token-histogram pattern_bench pair
  * (sec_hist_compressed vs sec_hist_decode_group) over the bench chunk
  * table — isolates the pair from the full bench pass.
  */
object HistProbe {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/graft_bench_input_2000000_chunks_auto_v3"
    val laps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-hist-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val chunks = spark.read.parquet(path)
    val variants: Seq[(String, () => Long)] = Seq(
      "cmp_hist" -> (() => Graft.tokenHistogram(chunks).count()),
      "dec_hist" -> (() => graft.encode.EncodeJob.decodeDf(chunks)
        .select(explode(col("tokens")).as("tok")).groupBy("tok").count().count()))
    val times = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    for (lap <- 1 to laps + 1; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val n = f()
      val sec = (System.nanoTime() - t0) / 1e9
      if (lap > 1 && sec < times(name)) times(name) = sec
      println(f"lap $lap $name%-9s $sec%7.2f s  n=$n")
    }
    println("--- min over timed laps ---")
    times.toSeq.sortBy(_._1).foreach { case (n, t) => println(f"$n%-9s $t%7.2f s") }
    spark.stop()
  }
}
