package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-job decomposition of a single driver query's wall clock (guide §1/§7):
  * runs one named SparkEntry query cold (fresh session, after the flagship
  * warmup graft.Bench also does) and again warm, printing every Spark job's
  * wall time + description, plus the job-free residue (driver-side planning,
  * codegen, JIT, eager non-job work). Separates "this query schedules too
  * many jobs" from "the driver burns time between jobs".
  *
  * Usage: runMain graft.tools.ProfileQuery <queryName> [queryName2 ...]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <queryName>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.files.maxPartitionBytes",
        math.max((1L << 30) / (4L * cpus), 16L << 20).toString)
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobStart = mutable.Map.empty[Int, (Long, String)]
    val jobs = mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobStart(js.jobId) = (System.nanoTime(), desc + s" [${js.stageInfos.size} stages]")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.remove(je.jobId).foreach { case (t0, desc) =>
          jobs += ((je.jobId, (System.nanoTime() - t0) / 1e9, desc))
        }
    })

    try graft.SparkEntry.entry(spark).count() catch {
      case e: Throwable => System.err.println(s"[profile] warmup failed: ${e.getMessage}")
    }

    for (name <- args; pass <- Seq("cold", "warm")) {
      jobs.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      val jobSum = jobs.map(_._2).sum
      println(f"== $name [$pass] total=$total%.3f s, ${jobs.size} jobs summing ${jobSum}%.3f s, residue=${total - jobSum}%.3f s")
      jobs.foreach { case (id, sec, desc) => println(f"   job $id%3d $sec%7.3f s  $desc") }
    }
    spark.stop()
  }
}
