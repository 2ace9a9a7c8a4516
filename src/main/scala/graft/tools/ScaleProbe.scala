package graft.tools

import graft.encode.{EncodeJob, EncodeOptions}
import graft.format.TokenRow
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Stage/task-level scaling probe for the encode job.
  * Run: sbt "runMain graft.tools.ScaleProbe <cpus> <path>"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val path = args(1)
    val nb = if (args.length > 2) args(2).toInt else 64
    // mirror Bench's session: splits sized for >=3-4 map waves per thread;
    // SPARK_GRAFT_SHUFFLE_COMPRESS=true A/Bs lz4 on the block shuffle
    val compress = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true")
    val maxPartitionBytes = math.max((1L << 30) / (4L * cpus), 16L << 20)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes.toString)
      .config("spark.shuffle.compress", compress)
      .config("spark.shuffle.spill.compress", compress)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val stageTasks = mutable.HashMap.empty[Int, mutable.ArrayBuffer[(Long, Long, Long)]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        val m = t.taskMetrics
        if (m != null) stageTasks.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) +=
          ((m.executorRunTime, m.executorDeserializeTime, m.jvmGCTime))
      }
    })

    val input = spark.read.parquet(path).as[TokenRow]
    // warm
    val c0 = EncodeJob.encode(input, EncodeOptions(numBuckets = nb))
    EncodeJob.sizeReport(c0)
    stageTasks.clear()

    // stage decomposition: parquet-scan-only, map-side-pack-only (no
    // shuffle), and full job — isolates where 8→32 inflation concentrates
    def mapOnly(): Long = {
      import org.apache.spark.sql.functions.col
      val df = EncodeJob.withBucket(spark.read.parquet(path), EncodeOptions(numBuckets = nb))
        .select(col("__bucket"), col("doc_id"), col("tokens"), col("n_tok"), col("source"))
      org.apache.spark.sql.GraftBridge.toInternalRdd(df)
        .mapPartitions(graft.encode.TokenBlocks.pack)
        .map(_._2.length.toLong).reduce(_ + _)
    }
    def scanOnly(): Long = {
      import org.apache.spark.sql.functions.{col, size, sum}
      spark.read.parquet(path).agg(sum(size(col("tokens")))).collect()(0).getLong(0)
    }
    def timeIt(name: String)(f: => Any): Unit = {
      f
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"cpus=$cpus $name%-12s best=$best%6.2f s")
    }
    timeIt("scan_only")(scanOnly())
    timeIt("map_pack")(mapOnly())

    for (iter <- 1 to 6) {
      stageTasks.clear()
      val t0 = System.nanoTime()
      val c = EncodeJob.encode(input, EncodeOptions(numBuckets = nb))
      EncodeJob.sizeReport(c)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"cpus=$cpus iter=$iter wall=$wall%.2f s")
    }
    stageTasks.toSeq.sortBy(_._1).foreach { case (sid, ts) =>
      val run = ts.map(_._1)
      println(f"stage=$sid%3d tasks=${ts.length}%3d sumRun=${run.sum / 1e3}%7.2f s " +
        f"maxRun=${run.max / 1e3}%6.2f s gc=${ts.map(_._3).sum / 1e3}%5.2f s deser=${ts.map(_._2).sum / 1e3}%5.2f s")
    }
    spark.stop()
  }
}
