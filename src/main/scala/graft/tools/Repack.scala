package graft.tools

import org.apache.spark.sql.SparkSession

/** Rewrite a parquet table into N flat files (drops Hive partitioning) —
  * isolates file-layout effects in scan A/Bs.
  * Run: sbt "runMain graft.tools.Repack <in> <out> <files>"
  */
object Repack {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(args(0)).repartition(args(2).toInt)
      .write.mode("overwrite").parquet(args(1))
    spark.stop()
  }
}
