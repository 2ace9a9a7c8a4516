package graft.tools

import org.apache.spark.sql.SparkSession

/** Timing scratch for the two decode-everything driver queries (round-4
  * item 1): runs q_roundtrip_decode and q_token_count_by_source standalone
  * with warm-up, printing per-lap seconds. Targets (round-3 verdict):
  * roundtrip ≤2.6 s, token_count ≤0.9 s at sf0.1 / local[32].
  */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // absorb one-time session + encode-cache cost like Bench's warmup does
    graft.SparkEntry.entry(spark).count()
    for (name <- Seq("q_codec_totals", "q_roundtrip_decode", "q_token_count_by_source");
         lap <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sf).count()
      println(f"$name lap$lap: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
