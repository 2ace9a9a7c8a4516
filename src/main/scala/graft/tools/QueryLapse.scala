package graft.tools

import org.apache.spark.sql.SparkSession

/** Query-phase measurement harness (guide §1): replicates graft.Bench's
  * part-1 loop (same session config, same warmup, same sorted order, same
  * `.count()` action) WITHOUT the encode/pattern phases, so per-query
  * timings can be iterated on in ~1/5 the wall clock. Optionally runs N laps
  * (first = cold, later = warm) and prints per-query seconds for each lap —
  * the warm lap isolates plan+compute cost from one-time cache builds.
  *
  * Usage: runMain graft.tools.QueryLapse [laps] [nameFilter]
  */
object QueryLapse {
  def main(args: Array[String]): Unit = {
    val laps = if (args.nonEmpty) args(0).toInt else 1
    val filter = if (args.length > 1) Some(args(1)) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val maxPartitionBytes = math.max((1L << 30) / (4L * cpus), 16L << 20)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-querylapse-$cpus")
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes.toString)
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch {
      case e: Throwable => System.err.println(s"[lapse] warmup failed: ${e.getMessage}")
    }
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.forall(n.contains) }
    for (lap <- 1 to laps) {
      var total = 0.0
      for ((name, fn) <- qs) {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[lapse] $name FAILED: ${e.getMessage}"); false
        }
        val sec = (System.nanoTime() - t0) / 1e9
        total += sec
        println(f"LAP$lap $name%-28s ${if (ok) sec else -1.0}%8.3f")
      }
      println(f"LAP$lap TOTAL $total%8.3f")
    }
    spark.stop()
  }
}
