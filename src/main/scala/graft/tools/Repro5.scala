package graft.tools

import graft.encode.EncodeJob
import graft.query.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch repro for the round-5 bench additions at sf0.1: bigram generator,
  * pack pair, sample pair — isolates whichever query killed the bench run.
  */
object Repro5 {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-repro5")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.install(spark)
    val autoChunks =
      if (sf.startsWith("/tmp/")) spark.read.parquet(sf)
      else graft.Queries.autoChunks(spark, sf).cache()
    println(s"chunks=${autoChunks.count()}")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    val numId = org.apache.spark.sql.functions
      .expr("CAST(substring_index(doc_id, '-', -1) AS BIGINT)")
    timed("pack_encoded")(
      graft.pipeline.Packing.packSummary(
        Graft.rowMeta(autoChunks).withColumn("doc_id", numId),
        seqLen = 1024, bucketWidth = 4096).count())
    timed("pack_decoded")(
      graft.pipeline.Packing.packSummary(
        EncodeJob.decodeDf(autoChunks)
          .select(numId.as("doc_id"), col("source"), col("n_tok")),
        seqLen = 1024, bucketWidth = 4096).count())
    def sampleSum(df: org.apache.spark.sql.DataFrame): Long = df
      .filter(graft.pipeline.PipelineFunctions.sampleBucket(
        org.apache.spark.sql.functions.xxhash64(col("doc_id")), 100) < 2)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr("aggregate(tokens, 0L, (a, x) -> a + x)")))
      .collect()(0).getLong(0)
    timed("sample_encoded")(sampleSum(Graft.encodedRows(autoChunks)))
    timed("sample_decode_all")(sampleSum(EncodeJob.decodeDf(autoChunks)))
    timed("bigram_compressed")(Graft.bigramHistogram(autoChunks).count())
    spark.stop()
  }
}
