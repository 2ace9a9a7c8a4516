package graft.tools

import graft.encode.{EncodeJob, EncodeOptions}
import org.apache.spark.sql.SparkSession

/** Materialize the bench chunk tables (auto + fsst) for a token-table input,
  * exactly as graft.Bench's pattern phase does — so kernel probes
  * (BigramProbe, KernelBench) can run without a full bench pass.
  * Run: sbt "runMain graft.tools.MakeChunks [/tmp/graft_bench_input_2000000]"
  */
object MakeChunks {
  def main(args: Array[String]): Unit = {
    val inputPath = if (args.nonEmpty) args(0) else "/tmp/graft_bench_input_2000000"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val input = spark.read.parquet(inputPath).as[graft.format.TokenRow]
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    for ((tag, opts) <- Seq(
        "auto" -> EncodeOptions(numBuckets = 64),
        "fsst" -> EncodeOptions(numBuckets = 64, forceCodec = Some("fsst")))) {
      val p = s"${inputPath}_chunks_${tag}_v3"
      if (!fs.exists(new org.apache.hadoop.fs.Path(p))) {
        EncodeJob.encode(input, opts).write.mode("overwrite").parquet(p)
        println(s"wrote $p")
      } else println(s"exists $p")
    }
    spark.stop()
  }
}
