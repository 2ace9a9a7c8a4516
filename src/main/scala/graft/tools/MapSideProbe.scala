package graft.tools

import graft.encode.{EncodeJob, EncodeOptions}
import graft.format.TokenRow
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Decomposes encode-job map-side cost: parquet scan alone vs scan+shuffle,
  * at one parallelism level. Run: sbt "runMain graft.tools.MapSideProbe <cpus> <path>"
  */
object MapSideProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val path = args(1)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val cpuTime = mutable.ArrayBuffer.empty[Long]
    var gcTime = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        if (t.taskMetrics != null) { cpuTime += t.taskMetrics.executorRunTime; gcTime += t.taskMetrics.jvmGCTime }
      }
    })
    def timed(name: String)(f: => Unit): Unit = {
      f // warm
      val walls = (1 to 3).map { _ =>
        cpuTime.clear(); gcTime = 0
        val t0 = System.nanoTime()
        f
        val w = (System.nanoTime() - t0) / 1e9
        (w, cpuTime.sum / 1e3, gcTime / 1e3)
      }
      val (w, c, g) = walls.minBy(_._1)
      println(f"cpus=$cpus $name%-28s wall=$w%6.2f s cpu=$c%7.2f s gc=$g%5.2f s")
    }

    val input = spark.read.parquet(path)
    timed("scan_tokens_only") {
      input.select(sum(size(col("tokens")))).collect()
    }
    timed("scan_all_columns") {
      input.select(sum(size(col("tokens"))), count(col("doc_id")), count(col("source"))).collect()
    }
    timed("scan_shuffle_count") {
      EncodeJob.plan(input.as[TokenRow], EncodeOptions(numBuckets = 64)).rdd.count()
    }
    timed("full_encode") {
      EncodeJob.sizeReport(EncodeJob.encode(input.as[TokenRow], EncodeOptions(numBuckets = 64)))
    }
    spark.stop()
  }
}
