package graft.tools

import graft.encode.{EncodeJob, EncodeOptions, Truncate}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the truncation gate's claim: compressed-domain max-seq-len
  * enforcement is priced by the LONG-ROW fraction, not the corpus size.
  * Three caps over the same auto-codec chunk table:
  *
  *   pass — cap above every row length: every chunk passes the per-row
  *          varint-prefix gate byte-identical, the job is a metadata pass
  *          (the 100-TB fast path — an already-capped corpus re-capped);
  *   p50  — cap at the median row length: ~half the rows rewrite, chunks
  *          splice clean rows and cut dirty ones in their codec domain;
  *   hard — cap at 16 tokens: nearly every row rewrites (worst case, the
  *          codec-domain cut cost without re-encode or retraining).
  *
  * Input as in [[ScrubProbe]]: an sf test dir or a TokenRow parquet (the
  * 385M-token bench input). Prints per-case wall seconds (min of `laps`),
  * touched-chunk counts, and the kept-token fraction.
  */
object TruncateProbe {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/graft_bench_input_2000000"
    val laps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-truncate-probe")
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
    // row-length shape from the metadata plane (one varint per row, no decode)
    val meta = graft.query.Graft.rowMeta(chunks)
    val Array(p50, pMax) = meta.stat.approxQuantile("n_tok", Array(0.5, 1.0), 0.001)
    println(s"chunks=$nChunks total_tokens=$totalToks p50_len=${p50.toInt} max_len=${pMax.toInt}")
    println(s"codec_mix: $mix")

    val origCrc = chunks.select(col("chunk_id"), col("part_id"), col("crc").as("crc0"))
    def run(name: String, cap: Int): Unit = {
      var best = Double.MaxValue
      var touched = -1L
      var kept = -1L
      for (_ <- 1 to laps) {
        val t0 = System.nanoTime()
        val truncated = Truncate.truncate(chunks, cap).toDF()
        val agg = truncated.select(col("chunk_id"), col("part_id"), col("crc"), col("n_tokens"))
          .join(origCrc, Seq("chunk_id", "part_id"))
          .agg(sum(when(col("crc") =!= col("crc0"), 1L).otherwise(0L)),
            sum(col("n_tokens"))).collect()(0)
        touched = agg.getLong(0)
        kept = agg.getLong(1)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      val mtokSec = totalToks / best / 1e6
      println(f"$name%-5s cap=$cap%-7d sec=$best%.3f touched=$touched/$nChunks " +
        f"kept_frac=${kept.toDouble / totalToks}%.3f corpus_mtok_per_sec=$mtokSec%.1f")
    }
    run("pass", pMax.toInt)
    run("p50", math.max(p50.toInt, 1))
    run("hard", 16)
    spark.stop()
  }
}
