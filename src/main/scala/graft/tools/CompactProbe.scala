package graft.tools

import graft.encode.{Compact, EncodeJob, EncodeOptions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices compaction against the alternative (decode + full re-encode) on
  * the bench token table: the input is encoded with a small chunk target
  * (debris shape), then (a) compacted back to the standard 512Ki-token
  * target — byte-splicing under shared headers — and (b) re-encoded from
  * decoded rows, both timed. Decode-equality totals cross-assert (a).
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/graft_bench_input_2000000"
    val laps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-compact-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val input = spark.read.parquet(path).as[graft.format.TokenRow]
    // debris shape: 32Ki-token chunks (1/16 of the standard target)
    val small = EncodeJob.encode(input,
      EncodeOptions(maxTokensPerChunk = 1L << 15)).toDF().cache()
    val nSmall = small.count()
    val toks = small.agg(sum("n_tokens")).collect()(0).getLong(0)
    println(s"small_chunks=$nSmall tokens=$toks")

    var tCompact = Double.MaxValue
    var nComp = 0L
    for (_ <- 1 to laps) {
      val t0 = System.nanoTime()
      nComp = Compact.compact(small).toDF().count()
      tCompact = math.min(tCompact, (System.nanoTime() - t0) / 1e9)
    }
    println(f"compact: $nSmall -> $nComp chunks, sec=$tCompact%.3f " +
      f"(${toks / tCompact / 1e6}%.1f Mtok/s)")

    var tReenc = Double.MaxValue
    for (_ <- 1 to laps) {
      val t0 = System.nanoTime()
      EncodeJob.encode(
        EncodeJob.decodeDf(small).select(col("doc_id"), col("tokens"),
          col("n_tok"), col("source")).as[graft.format.TokenRow],
        EncodeOptions()).toDF().count()
      tReenc = math.min(tReenc, (System.nanoTime() - t0) / 1e9)
    }
    println(f"reencode: sec=$tReenc%.3f (${toks / tReenc / 1e6}%.1f Mtok/s) " +
      f"-> compaction is ${tReenc / tCompact}%.1fx cheaper")
    spark.stop()
  }
}
