package graft.tools

import graft.encode.{EncodeJob, EncodeOptions}
import graft.format.TokenRow
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the token mass of the heaviest buckets vs the mean — the straggler
  * diagnostic for the explicit repartition.
  */
object BucketBalance {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/graft_bench_input_400000"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val input = spark.read.parquet(path).as[TokenRow]
    val b = EncodeJob.withBucket(input.toDF(), EncodeOptions(numBuckets = 64))
      .groupBy(col("__bucket")).agg(sum(col("n_tok")).as("toks"), count(lit(1)).as("rows"))
      .orderBy(desc("toks"))
    val rows = b.collect()
    val total = rows.map(_.getLong(1)).sum
    println(f"buckets=${rows.length} total=$total mean=${total / rows.length}")
    rows.take(8).foreach(r => println(f"bucket=${r.getInt(0)}%3d toks=${r.getLong(1)}%10d rows=${r.getLong(2)}%7d frac=${r.getLong(1).toDouble / total}%.3f"))
    spark.stop()
  }
}
