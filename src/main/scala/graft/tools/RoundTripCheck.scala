package graft.tools

import graft.encode.{EncodeJob, EncodeOptions}
import graft.format.TokenRow
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-scale bit-identical round-trip check: encode the synthetic table,
  * decode it, and verify every row's token array equals the input (plus
  * count and token-sum invariants). Run:
  *   sbt "runMain graft.tools.RoundTripCheck /tmp/graft_bench_input_1000000"
  */
object RoundTripCheck {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/graft_bench_input_1000000"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val input = spark.read.parquet(path).as[TokenRow]
    val chunks = EncodeJob.encode(input, EncodeOptions(numBuckets = 128))
    val decoded = EncodeJob.decode(chunks)
    val stats = decoded.toDF().alias("d")
      .join(input.toDF().alias("i"), Seq("doc_id"), "full_outer")
      .agg(count(lit(1)).as("rows"),
        sum(when(col("d.tokens") <=> col("i.tokens"), 0).otherwise(1)).as("mismatched"),
        sum(when(col("d.source") <=> col("i.source"), 0).otherwise(1)).as("bad_source"),
        sum(col("i.n_tok")).as("tokens_in"), sum(col("d.n_tok")).as("tokens_out"))
      .collect()(0)
    println(s"rows=${stats.getLong(0)} mismatched=${stats.getLong(1)} " +
      s"bad_source=${stats.getLong(2)} tokens_in=${stats.getLong(3)} tokens_out=${stats.getLong(4)}")
    assert(stats.getLong(1) == 0 && stats.getLong(2) == 0 &&
      stats.getLong(3) == stats.getLong(4), "ROUND TRIP FAILED")
    println("ROUND TRIP OK (bit-identical at scale)")
    spark.stop()
  }
}
