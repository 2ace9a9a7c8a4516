package graft.tools

import graft.core._
import org.apache.spark.sql.SparkSession

/** Dev smoke driver: exercises the core codec + matcher kernels end-to-end on
  * the real testdata documents corpus. Run:
  *   sbt "runMain graft.tools.CoreSmoke /root/testdata/sf0.01"
  */
object CoreSmoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val vocab = texts.flatMap(_.trim.split("\\s+")).distinct.sorted.zipWithIndex.toMap
    val rows: IndexedSeq[Array[Int]] = texts.toIndexedSeq.map(_.trim.split("\\s+").map(vocab))
    println(s"rows=${rows.length} totalTokens=${rows.map(_.length).sum} vocab=${vocab.size}")
    val stats = ChunkStats.compute(rows)
    val choice = CodecSelector.choose(rows, stats)
    println(s"selector chose: ${choice.codec.name} est=${choice.estBytes}")
    val enc = choice.codec.encoder(choice.header)
    val out = new ByteWriter()
    val offs = new Array[Int](rows.length + 1)
    rows.zipWithIndex.foreach { case (r, i) => enc.encode(r, out); offs(i + 1) = out.size }
    println(f"raw=${stats.varintBytes} enc=${out.size} bytes/token=${out.size.toDouble / stats.totalTokens}%.3f")
    val dec = choice.codec.decoder(choice.header)
    val data = out.toBytes
    val ok = rows.indices.forall(i => java.util.Arrays.equals(dec.decode(data, offs(i), offs(i + 1)), rows(i)))
    println(s"ROUNDTRIP bit-identical: $ok")

    val fh = FsstTokenCodec.buildHeader(rows, stats)
    val st = SymTab.fromBytes(fh)
    val fe = FsstTokenCodec.encoder(fh)
    val fo = new ByteWriter(); val foffs = new Array[Int](rows.length + 1)
    rows.zipWithIndex.foreach { case (r, i) => fe.encode(r, fo); foffs(i + 1) = fo.size }
    println(f"fsst bytes/token=${(fo.size + fh.length).toDouble / stats.totalTokens}%.3f symbols=${st.nSymbols}")
    val pat = Array(vocab("value"), vocab("table"))
    val pm = new PatternMachine(Array(pat), st)
    val fb = fo.toBytes
    val gotC = rows.indices.filter(i => FsstMatch.contains(fb, foffs(i), foffs(i + 1), pm))
    val oracle = rows.indices.filter(i => TokenMatch.contains(rows(i), pat))
    val likeOracle = texts.zipWithIndex.collect { case (t, i) if (" " + t.trim + " ").contains(" value table ") => i }.toSeq
    println(s"contains [value table]: compressed=${gotC.size} tokenOracle=${oracle.size} textLIKE=${likeOracle.size} agree=${gotC == oracle && oracle == likeOracle}")
    val pmAbs = new PatternMachine(Array(Array(999999)), st)
    val absHits = rows.indices.count(i => FsstMatch.contains(fb, foffs(i), foffs(i + 1), pmAbs))
    println(s"probe absent-token pattern hits=$absHits (expect 0)")
    val weird = IndexedSeq(Array(Int.MinValue, -1, 0, Int.MaxValue), Array.emptyIntArray, Array.fill(10000)(7))
    val ws = ChunkStats.compute(weird); val wc = CodecSelector.choose(weird, ws)
    val we = wc.codec.encoder(wc.header); val wo = new ByteWriter(); val woffs = new Array[Int](4)
    weird.zipWithIndex.foreach { case (r, i) => we.encode(r, wo); woffs(i + 1) = wo.size }
    val wd = wc.codec.decoder(wc.header)
    val wok = weird.indices.forall(i => java.util.Arrays.equals(wd.decode(wo.toBytes, woffs(i), woffs(i + 1)), weird(i)))
    println(s"probe extreme-values chunk codec=${wc.codec.name} roundtrip=$wok")
    spark.stop()
  }
}
