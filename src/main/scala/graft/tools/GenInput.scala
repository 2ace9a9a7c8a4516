package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerate the deterministic bench input table (the host's /tmp is
  * volatile across reboots; generation is excluded from every timing).
  * Run: sbt "runMain graft.tools.GenInput [rows] [files]"
  */
object GenInput {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 2000000L
    val files = if (args.length > 1) args(1).toInt else 64
    val out = s"/tmp/graft_bench_input_$rows"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.spark.SyntheticData.tokenTable(spark, rows, files)
      .write.mode("overwrite").parquet(out)
    println(s"wrote $out rows=$rows files=$files")
    spark.stop()
  }
}
