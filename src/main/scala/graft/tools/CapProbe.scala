package graft.tools

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Demonstrates the n-gram df-cap's posting-list² collapse on a corpus with
  * boilerplate (the 100-TB skew shape the cap exists for, SCALE.md §3).
  *
  * The synthetic corpus plants one boilerplate prefix in `hotFrac` of all
  * documents — the web-crawl pattern (shared headers/footers/licenses). Each
  * boilerplate gram then has document frequency f = hotFrac·nDocs, and the
  * uncapped inverted-index self-join pays f² pairs PER HOT GRAM while the
  * capped variant drops them before the join (a stopword-like gram carries
  * no dedup signal). At sf0.1's 5k clean docs the cap is pure overhead
  * (BENCH r3: 3.28 s capped vs 2.49 uncapped); this probe is the other side
  * of that tradeoff, at the corpus shape where the cap is the difference
  * between a bounded plan and a quadratic one.
  *
  * Run: sbt "runMain graft.tools.CapProbe [nDocs] [hotFrac]"
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 50000
    val hotFrac = if (args.length > 1) args(1).toDouble else 0.2
    val docLen = 30
    val cap = 1000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val hotMod = math.max(1, math.round(1.0 / hotFrac).toInt)
    // deterministic corpus: unique-ish random tokens; every hotMod-th doc
    // carries the 4-token boilerplate prefix (3 hot 3-grams per hot doc)
    val randToks = transform(sequence(lit(1), lit(docLen)),
      i => pmod(xxhash64(col("id"), i), lit(1000000)).cast("int"))
    val boiler = array((11 to 14).map(t => lit(t)): _*)
    val docs = spark.range(nDocs).select(
        col("id").cast("string").as("doc_id"),
        when(pmod(col("id"), lit(hotMod)) === 0, concat(boiler, randToks))
          .otherwise(randToks).as("tokens"),
        lit("web").as("source"))
      .withColumn("n_tok", size(col("tokens")))
      .cache()
    docs.count()

    def run(capped: Boolean): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = Dedup.ngramJaccardPairs(docs, n = 3, minInter = 2,
        maxPostings = if (capped) Some(cap) else None).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    // warm lap each (JIT + codegen), then interleaved timed laps, min per side
    run(capped = true); run(capped = false)
    var tCap = Double.MaxValue
    var tUncap = Double.MaxValue
    var nCap = 0L
    var nUncap = 0L
    for (_ <- 1 to 2) {
      val (nc, tc) = run(capped = true)
      val (nu, tu) = run(capped = false)
      nCap = nc; nUncap = nu
      tCap = math.min(tCap, tc); tUncap = math.min(tUncap, tu)
    }
    val hotDf = nDocs / hotMod
    println(f"""{"n_docs":$nDocs,"hot_df":$hotDf,"cap":$cap,"pairs_uncapped":$nUncap,"pairs_capped":$nCap,"sec_uncapped":$tUncap%.2f,"sec_capped":$tCap%.2f,"speedup":${tUncap / tCap}%.1f}""")
    spark.stop()
  }
}
