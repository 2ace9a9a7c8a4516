package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolation timer for arbitrary driver-contract queries: runs each named
  * SparkEntry query at the given sf dir, `laps` times, printing per-lap wall
  * seconds and row counts. Distinguishes a genuine regression from
  * bench-window contention — an inflated bench reading that comes back at
  * its usual time here was the window, not the code.
  *
  * Run: sbt "runMain graft.tools.Repro6 <sfdir> <laps> q_a q_b ..."
  */
object Repro6 {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val laps = if (args.length > 1) args(1).toInt else 2
    val names = if (args.length > 2) args.drop(2).toSeq
                else Seq("q_decontaminate_encoded", "q_dedup_minhash")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-repro6")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.query.Graft.install(spark)
    val qs = graft.SparkEntry.queries
    for (name <- names) {
      val fn = qs.getOrElse(name, sys.error(s"unknown query $name"))
      for (lap <- 1 to laps) {
        val t0 = System.nanoTime()
        val n = fn(spark, sf).count()
        println(f"$name lap$lap: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
