package graft.tools

import graft.encode.{Affix, EncodeJob, EncodeOptions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices compressed-domain sentinel injection (encode.Affix) at corpus
  * scale — the claim under test: attaching BOS/EOS to every document costs
  * far less than decode + re-encode, and OUT-OF-VOCABULARY sentinels (the
  * standard special-token convention) turn FSST chunks into a pure byte
  * splice. Three cases over the same auto-codec chunk table:
  *
  *   outvocab — sentinels above every chunk's max token: FSST chunks splice
  *              (escape + memcpy + escape), packed codecs re-pack/widen;
  *   invocab  — the most- and least-frequent corpus tokens: FSST rows take
  *              the decode-once + greedy-resync path;
  *   bos_only — single-sided affix (half the varint/packing delta).
  *
  * Each case cross-checks the affixed token COUNT per lap (tokens + rows ×
  * sentinels) and, once per case, a VALUE-sensitive aggregate — the
  * token-weighted histogram sum Σ tok·count, which any wrong token value
  * shifts (round-5 advisor: the count check alone could not catch a
  * value-corrupting splice). Positional byte-identity is covered by
  * Soak/QuerySpec; this probe reports wall seconds (min of `laps`) +
  * corpus Mtok/s to compare against the ~174 Mtok/s encode rate
  * (decode+re-encode floor) in BASELINE.md.
  *
  * Input as in [[ScrubProbe]]: an sf test dir or a TokenRow parquet (the
  * 385M-token bench input; regenerate with `runMain graft.tools.GenInput`).
  */
object AffixProbe {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/graft_bench_input_2000000"
    val laps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-affix-probe")
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
    val totalRows = chunks.agg(sum("row_count")).collect()(0).getLong(0)
    val mix = chunks.groupBy("codec").agg(count(lit(1)).as("n"), sum("n_tokens").as("toks"))
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}ch/${r.getLong(2)}tok")
      .sorted.mkString(" ")
    val maxTok = chunks.agg(max(col("stats.max_tok"))).collect()(0).getInt(0)
    val hist = graft.query.Graft.tokenHistogram(chunks).cache()
    val rareTok = hist.orderBy(col("n"), col("tok")).limit(1).collect()(0).getInt(0)
    val commonTok = hist.orderBy(col("n").desc, col("tok")).limit(1).collect()(0).getInt(0)
    // token-weighted corpus sum — the value-sensitive baseline for the
    // per-case splice check below (computed off compressed chunks, no decode)
    val baseVSum = hist.agg(sum(col("tok").cast("long") * col("n")))
      .collect()(0).getLong(0)
    hist.unpersist()
    println(s"chunks=$nChunks rows=$totalRows total_tokens=$totalToks max_tok=$maxTok " +
      s"rare_tok=$rareTok common_tok=$commonTok")
    println(s"codec_mix: $mix")

    def run(name: String, bos: Option[Int], eos: Option[Int]): Unit = {
      val add = bos.size + eos.size
      var best = Double.MaxValue
      for (_ <- 1 to laps) {
        val t0 = System.nanoTime()
        val got = Affix.affix(chunks, bos, eos).toDF()
          .agg(sum("n_tokens")).collect()(0).getLong(0)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        require(got == totalToks + totalRows * add,
          s"$name: affixed totals $got != ${totalToks + totalRows * add}")
      }
      // value-sensitive splice check (outside the timed laps): the affixed
      // table's token-weighted histogram sum must equal the base sum plus
      // rows × Σ sentinel values — any wrong token VALUE shifts it
      val vsum = graft.query.Graft.tokenHistogram(Affix.affix(chunks, bos, eos).toDF())
        .agg(sum(col("tok").cast("long") * col("n"))).collect()(0).getLong(0)
      val sentSum = (bos.toSeq ++ eos.toSeq).map(_.toLong).sum
      require(vsum == baseVSum + totalRows * sentSum,
        s"$name: value-weighted sum $vsum != ${baseVSum + totalRows * sentSum}")
      val mtokSec = totalToks / best / 1e6
      println(f"$name%-8s bos=$bos eos=$eos sec=$best%.3f corpus_mtok_per_sec=$mtokSec%.1f")
    }
    run("outvocab", Some(maxTok + 7), Some(maxTok + 11))
    run("invocab", Some(commonTok), Some(rareTok))
    run("bos_only", Some(maxTok + 7), None)
    spark.stop()
  }
}
