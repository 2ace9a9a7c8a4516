package graft.tools

import graft.encode.{EncodeJob, EncodeOptions}
import graft.spark.Tokenize
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch reproducer for the sf0.1 crc mismatch seen in Bench. */
object Repro {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val compress = if (args.length > 1) args(1) else "false"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .config("spark.shuffle.compress", compress)
      .config("spark.shuffle.spill.compress", compress)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val (input, _) = Tokenize.documents(spark, sf)
    val chunks = EncodeJob.encode(input, EncodeOptions()).toDF().cache()
    println(s"chunks=${chunks.count()} compress=$compress")
    val decoded = EncodeJob.decode(chunks.as[graft.format.EncodedChunk])
    val bad = decoded.toDF().alias("d")
      .join(input.toDF().alias("i"), Seq("doc_id"), "full_outer")
      .filter(not(col("d.tokens") <=> col("i.tokens"))).count()
    println(s"mismatched=$bad decoded=${decoded.count()} input=${input.count()}")
    spark.stop()
  }
}
