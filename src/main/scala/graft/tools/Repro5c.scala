package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch decomposition of q_dedup_clusters_encoded at sf0.1: pair
  * generation vs label propagation, encoded vs raw, interleaved laps.
  */
object Repro5c {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-repro5c")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.query.Graft.install(spark)
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    // warm the shared caches the bench would have warmed
    timed("warm_chunks")(graft.Queries.autoChunks(spark, sf).count())
    for (lap <- 1 to 2) {
      timed(s"lap$lap pairs_encoded")(
        graft.Queries.dedupMinhashEncoded(spark, sf).count())
      timed(s"lap$lap pairs_raw")(
        graft.PipelineQueries.queries("q_dedup_minhash")(spark, sf).count())
      timed(s"lap$lap clusters_encoded")(
        graft.Queries.dedupClustersEncoded(spark, sf).count())
      timed(s"lap$lap clusters_raw")(
        graft.PipelineQueries.queries("q_dedup_clusters")(spark, sf).count())
    }
    spark.stop()
  }
}
