package graft.tools

import graft.core.PatternMode
import graft.format.EncodedChunk
import graft.query.Graft
import graft.spark.SyntheticData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes the compressed-scan cost: where does scanPattern's time go
  * relative to raw scan and late decode? Run after a Bench has materialized
  * /tmp/graft_bench_input_<rows> and its _chunks_fsst_v3 table.
  */
object PatternProfile {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0) else "1000000"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Graft.install(spark)

    val inputPath = s"/tmp/graft_bench_input_$rows"
    val chunksPath = s"${inputPath}_chunks_fsst_v3"
    val pat = (0 until 64).map(SyntheticData.hotPhrase).maxBy(_.length).toSeq
    val input = spark.read.parquet(inputPath)
    val chunks = spark.read.parquet(chunksPath)

    def best(name: String)(f: => Long): Unit = {
      f
      val r = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        (n, (System.nanoTime() - t0) / 1e9)
      }.minBy(_._2)
      println(f"$name%-28s n=${r._1}%8d best=${r._2}%6.3f s")
    }

    best("raw_scan") {
      input.filter(Graft.containsTokens(col("tokens"), pat)).count()
    }
    best("chunk_scan (scanPattern)") {
      Graft.scanPattern(chunks, PatternMode.Contains, Seq(pat)).count()
    }
    best("chunk_scan size(arr) only") {
      // same expression, but SUM of per-chunk match counts without Generate
      val m = graft.query.ChunkMatchDocIds(
        Seq(col("doc_ids"), col("data"), col("offsets"), col("row_count"),
          col("symtab"), col("codec"), col("stats.symbol_bitmap"),
          col("stats.escaped_bitmap")).map(c => org.apache.spark.sql.GraftBridge.expression(c)),
        PatternMode.Contains, Seq(pat))
      chunks.select(size(org.apache.spark.sql.GraftBridge.column(m)).as("n"))
        .agg(sum("n")).collect()(0).getLong(0)
    }
    best("flatmap_match_count") {
      chunks.as[EncodedChunk].mapPartitions { it =>
        val parts = Array(pat.toArray)
        var n = 0L
        it.foreach { c =>
          val offs = graft.format.Offsets.unpack(c.offsets, c.row_count)
          val st = graft.core.SymTab.fromBytes(c.symtab)
          val pm = new graft.core.PatternMachine(parts, st)
          var i = 0
          while (i < c.row_count) {
            if (graft.core.FsstMatch.contains(c.data, offs(i), offs(i + 1), pm)) n += 1
            i += 1
          }
        }
        Iterator(n)
      }.reduce(_ + _)
    }
    best("late_decode (scanAndDecode)") {
      Graft.scanAndDecode(chunks.as[EncodedChunk], PatternMode.Contains, Seq(pat)).count()
    }
    spark.stop()
  }
}
