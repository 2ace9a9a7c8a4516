package graft.tools

import graft.encode.{EncodeJob, EncodeOptions, Scrub}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the scrub gate's claim: compressed-domain scrubbing is priced by
  * the DIRTY-CHUNK fraction, not the corpus size. Three banned sets over the
  * same auto-codec chunk table:
  *
  *   clean  — ids above every chunk's max token: the zone map rejects every
  *            chunk, the whole job is a metadata pass (the 100-TB fast path);
  *   rare   — the least-frequent token in the corpus: only the chunks whose
  *            zone map/bloom may contain it rewrite;
  *   common — the most-frequent token: most chunks rewrite (worst case,
  *            bounded below by the per-codec rewrite/re-encode cost of the
  *            dirty fraction).
  *
  * Input is either an sf test dir (documents.parquet → Queries.autoChunks)
  * or a TokenRow parquet (e.g. the bench input /tmp/graft_bench_input_*,
  * 385M tokens across the five codec-stress sources) which is encoded here
  * with the auto selector. Prints per-case wall seconds (min of `laps`),
  * touched-chunk counts (crc join vs the original), and the corpus shape.
  */
object ScrubProbe {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/graft_bench_input_2000000"
    val laps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-scrub-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.query.Graft.install(spark)
    import spark.implicits._

    val isSfDir = new java.io.File(s"$path/documents.parquet").exists()
    val chunks =
      if (isSfDir) graft.Queries.autoChunks(spark, path).cache()
      else EncodeJob.encode(
        spark.read.parquet(path).as[graft.format.TokenRow], EncodeOptions())
        .toDF().cache()
    val nChunks = chunks.count()
    val totalToks = chunks.agg(sum("n_tokens")).collect()(0).getLong(0)
    val mix = chunks.groupBy("codec").agg(count(lit(1)).as("n"), sum("n_tokens").as("toks"))
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}ch/${r.getLong(2)}tok")
      .sorted.mkString(" ")
    val maxTok = chunks.agg(max(col("stats.max_tok"))).collect()(0).getInt(0)
    // least- and most-frequent tokens from the compressed-domain histogram
    val hist = graft.query.Graft.tokenHistogram(chunks).cache()
    val rareTok = hist.orderBy(col("n"), col("tok")).limit(1).collect()(0).getInt(0)
    val commonTok = hist.orderBy(col("n").desc, col("tok")).limit(1).collect()(0).getInt(0)
    hist.unpersist()
    println(s"chunks=$nChunks total_tokens=$totalToks max_tok=$maxTok " +
      s"rare_tok=$rareTok common_tok=$commonTok")
    println(s"codec_mix: $mix")

    val origCrc = chunks.select(col("chunk_id"), col("part_id"), col("crc").as("crc0"))
    def run(name: String, banned: Seq[Int], unk: Int): Unit = {
      var best = Double.MaxValue
      var touched = -1L
      for (_ <- 1 to laps) {
        val t0 = System.nanoTime()
        val scrubbed = Scrub.scrub(chunks, banned, unk).toDF()
        touched = scrubbed.select(col("chunk_id"), col("part_id"), col("crc"))
          .join(origCrc, Seq("chunk_id", "part_id"))
          .filter(col("crc") =!= col("crc0")).count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      val mtokSec = totalToks / best / 1e6
      println(f"$name%-8s banned=$banned unk=$unk sec=$best%.3f " +
        f"touched=$touched/$nChunks corpus_mtok_per_sec=$mtokSec%.1f")
    }
    run("clean", Seq(maxTok + 7, maxTok + 11), 0)
    run("rare", Seq(rareTok), commonTok)
    run("common", Seq(commonTok), rareTok)
    spark.stop()
  }
}
