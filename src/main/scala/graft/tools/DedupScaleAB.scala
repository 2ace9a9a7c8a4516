package graft.tools

import graft.query.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, element_at}

/** Scale datapoint for the compressed-domain dedup kernels (round 5): runs
  * the three signature passes that a web-scale dedup pipeline would push
  * over a 100-TB chunk table — 128-bit exact-dedup content hashes, MinHash
  * signatures (sig-only), 64-bit SimHash — on an EXISTING encoded chunk
  * table (e.g. the ScaleUp10x output at /tmp/graft_scaleup_table_<rows>) at
  * local[8] and local[32], and prints per-pass wall seconds, aggregate
  * tokens/s, and the 8→32 scaling efficiency. Interleaved laps (1 warm + 2
  * timed per level, min taken) so host-noise windows hit both levels alike.
  *
  * Run: sbt "runMain graft.tools.DedupScaleAB /tmp/graft_scaleup_table_20000000"
  */
object DedupScaleAB {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-dedupscale-$cpus")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DedupScaleAB <chunk-table-path> [laps]")
    val path = args(0)
    val laps = if (args.length > 1) args(1).toInt else 3

    final case class Pass(name: String, run: (SparkSession, String) => Long)
    val passes = Seq(
      Pass("exact_hash", (s, p) =>
        Graft.dedupExactEncoded(s.read.parquet(p)).count()),
      Pass("minhash_sig", (s, p) =>
        Graft.minhashRowsEncoded(s.read.parquet(p), shingleN = 3, numHashes = 64,
            seed = 42L, collectGrams = false)
          .agg(bit_xor(element_at(col("sig"), 1))).collect()(0).getLong(0)),
      Pass("simhash", (s, p) =>
        Graft.simhashRowsEncoded(s.read.parquet(p))
          .agg(bit_xor(col("sig"))).collect()(0).getLong(0)))

    val results = scala.collection.mutable.Map.empty[(Int, String), Double]
      .withDefaultValue(Double.MaxValue)
    val checks = scala.collection.mutable.Map.empty[(Int, String), Long]
    var tokens = 0L

    for (lap <- 1 to laps; cpus <- Seq(8, 32)) {
      val s = session(cpus)
      tokens = s.read.parquet(path)
        .agg(org.apache.spark.sql.functions.sum(col("n_tokens"))).collect()(0).getLong(0)
      for (p <- passes) {
        val t0 = System.nanoTime()
        val v = p.run(s, path)
        val sec = (System.nanoTime() - t0) / 1e9
        checks.get((if (cpus == 8) 32 else 8, p.name)).foreach(prev =>
          require(prev == v, s"${p.name}: levels disagree ($prev vs $v)"))
        checks((cpus, p.name)) = v
        if (lap > 1 && sec < results((cpus, p.name))) results((cpus, p.name)) = sec
      }
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    val loads =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val parts = passes.map { p =>
      val t8 = results((8, p.name))
      val t32 = results((32, p.name))
      f""""${p.name}":{"sec_local8":$t8%.3f,"sec_local32":$t32%.3f,"tokens_per_sec_local32":${(tokens / t32).toLong},"eff_8_to_32":${t8 / (4 * t32)}%.3f}"""
    }
    println(s"""{"table":"$path","tokens":$tokens,"load_avg":$loads,${parts.mkString(",")}}""")
  }
}
