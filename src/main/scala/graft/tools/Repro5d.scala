package graft.tools

import graft.encode.{Compact, EncodeJob, EncodeOptions}
import graft.spark.Tokenize
import org.apache.spark.sql.SparkSession

/** Scratch: inspect the q_compact_roundtrip wave-union shape. */
object Repro5d {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (input, _) = Tokenize.documents(spark, sf)
    val waves = (0 until 4).map { w =>
      val slice = input.filter((r: graft.format.TokenRow) =>
        java.lang.Long.remainderUnsigned(
          graft.pipeline.Hashing.mix64(r.doc_id.hashCode.toLong), 4L) == w.toLong)
      EncodeJob.encode(slice, EncodeOptions(numBuckets = 8, jobTag = w.toLong)).toDF()
    }
    val small = waves.reduce(_ unionByName _).cache()
    val compacted = Compact.compact(small).toDF().cache()
    println(s"small=${small.count()} compacted=${compacted.count()}")
    compacted.groupBy("codec").count().collect().foreach(println)
    println(s"rows=${graft.Queries.compactRoundtrip(spark, sf).count()}")
    spark.stop()
  }
}
