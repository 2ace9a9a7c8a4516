package graft.encode

import graft.format._
import graft.spark.Tokenize
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark-level round-trip + resume tests (SURVEY.md §5: the structural copy
  * of the reference's full-decompression assert, /root/reference/sketch.cc:1280-1299,
  * plus the north_rule resume requirement).
  */
class EncodeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("encode→decode round-trips the documents token table bit-identically") {
    import spark.implicits._
    val (input, _) = Tokenize.documents(spark, sf)
    val opts = EncodeOptions(numBuckets = 8, maxRowsPerChunk = 16, maxTokensPerChunk = 4096)
    val chunks = EncodeJob.encode(input, opts).cache()
    assert(chunks.count() > 1, "expected multiple chunks")
    val decoded = EncodeJob.decode(chunks)
    // per-row token-array equality via join on doc_id (both directions)
    val mismatched = decoded.toDF().alias("d")
      .join(input.toDF().alias("i"), Seq("doc_id"), "full_outer")
      .filter(not(col("d.tokens") <=> col("i.tokens")) ||
        not(col("d.source") <=> col("i.source")) || not(col("d.n_tok") <=> col("i.n_tok")))
      .count()
    assert(mismatched == 0, s"$mismatched rows differ after round-trip")
    assert(decoded.count() == input.count())
  }

  test("driver-side vocabulary sort equals the distributed orderBy on adversarial words") {
    import spark.implicits._
    // supplementary-plane (4-byte UTF-8), 3-byte BMP, combining marks,
    // empty-adjacent prefixes: exactly the words where UTF-16
    // String.compareTo and UTF-8 byte order disagree
    val words = Seq("zeta", "Zeta", "😀emoji", "�repl", "a",
      "ab", "á", "é", "中文", "0num", "~tilde", "za")
    val df = words.zipWithIndex
      .map { case (w, i) => (i.toLong, s" $w ", "t") }
      .toDF("doc_id", "text", "source")
    val distributed = Tokenize.vocabularyDf(df).orderBy("id")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val driver = words.toArray
    java.util.Arrays.sort(driver, (a: String, b: String) => Tokenize.utf8Compare(a, b))
    assert(distributed.map(_._1).toSeq == driver.toSeq,
      s"driver UTF-8 sort diverges from distributed orderBy:\n" +
        s"  distributed=${distributed.map(_._1).mkString(",")}\n" +
        s"  driver=${driver.mkString(",")}")
  }

  test("decode rejects corrupt data and unsupported format versions") {
    import spark.implicits._
    val (input, _) = Tokenize.documents(spark, sf)
    val chunks = EncodeJob.encode(input, EncodeOptions(numBuckets = 2)).cache()
    // flip one payload byte → the whole-chunk crc must fire on the
    // InternalRow decode path
    val corrupt = chunks.map { c =>
      val d = c.data.clone(); d(d.length / 2) = (d(d.length / 2) ^ 0x40).toByte
      c.copy(data = d)
    }
    val e1 = intercept[org.apache.spark.SparkException] {
      EncodeJob.decodeDf(corrupt.toDF()).count()
    }
    assert(e1.getMessage.contains("crc mismatch"))
    // future-format chunks must fail with a clear version error, not a crc one
    val future = chunks.map(c => c.copy(ver = ChunkOps.FormatVersion + 1))
    val e2 = intercept[org.apache.spark.SparkException] {
      EncodeJob.decodeDf(future.toDF()).count()
    }
    assert(e2.getMessage.contains("unsupported chunk format version"))
  }

  test("encode is deterministic: same input and options → identical chunk table") {
    val (input, _) = Tokenize.documents(spark, sf)
    val opts = EncodeOptions(numBuckets = 4, maxRowsPerChunk = 32, maxTokensPerChunk = 8192)
    def fingerprint(): Seq[(Long, Long, String)] =
      EncodeJob.encode(input, opts).collect()
        .map(c => (c.chunk_id, c.crc, c.codec)).sortBy(_._1).toSeq
    assert(fingerprint() == fingerprint())
  }

  test("resume: interrupted encode resumes exactly from the manifest") {
    import spark.implicits._
    val (input, _) = Tokenize.documents(spark, sf)
    val opts = EncodeOptions(numBuckets = 6, maxRowsPerChunk = 32,
      maxTokensPerChunk = 8192, waves = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_resume").toString

    // full reference run into dirA
    val ioA = new ParquetTableIO(s"$dir/a")
    ResumableEncode.run(spark, input, ioA, "run1", opts)

    // interrupted run: a TableIO wrapper that dies at the wave-1 chunk write,
    // leaving wave 0 committed (manifest) and nothing else
    val dirC = s"$dir/c"
    val ioC = new ParquetTableIO(dirC)
    // first attempt: only wave 0 runs (waves=3 but we interrupt by limiting)
    val partial = new TableIO {
      var wavesDone = 0
      def appendChunks(c: org.apache.spark.sql.Dataset[EncodedChunk], commitId: String): Unit = {
        if (wavesDone >= 1) throw new RuntimeException("simulated kill after wave 0")
        ioC.appendChunks(c, commitId)
      }
      def appendManifest(r: org.apache.spark.sql.DataFrame): Unit = {
        ioC.appendManifest(r); wavesDone += 1
      }
      def readChunks(s: SparkSession) = ioC.readChunks(s)
      def readManifest(s: SparkSession) = ioC.readManifest(s)
    }
    intercept[RuntimeException] {
      ResumableEncode.run(spark, input, partial, "run1", opts)
    }
    val committedAfterKill = ioC.readManifest(spark).get.count()
    assert(committedAfterKill > 0 && committedAfterKill < 6,
      s"expected partial manifest, got $committedAfterKill/6")

    // resume: completes remaining buckets only
    ResumableEncode.run(spark, input, ioC, "run1", opts)
    assert(ioC.readManifest(spark).get.select("part_id").distinct().count() == 6)

    // final chunk table identical to the uninterrupted run
    def fp(io: ParquetTableIO): Seq[(Long, Long, String, Int)] =
      io.readChunks(spark).collect().map(c => (c.chunk_id, c.crc, c.codec, c.row_count))
        .sortBy(_._1).toSeq
    assert(fp(ioC) == fp(ioA), "resumed table differs from uninterrupted run")

    // and the decoded content still matches the input exactly
    val decoded = EncodeJob.decode(ioC.readChunks(spark))
    val bad = decoded.toDF().alias("d").join(input.toDF().alias("i"), Seq("doc_id"), "full_outer")
      .filter(not(col("d.tokens") <=> col("i.tokens"))).count()
    assert(bad == 0)
  }

  test("resume drops orphan chunks from a crash between chunk append and manifest append") {
    import spark.implicits._
    val (input, _) = Tokenize.documents(spark, sf)
    val opts = EncodeOptions(numBuckets = 6, maxRowsPerChunk = 32,
      maxTokensPerChunk = 8192, waves = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_orphan").toString
    val io = new ParquetTableIO(s"$dir/t")
    // crash exactly in the window: chunks of wave 0 land, manifest does not
    val crashing = new TableIO {
      def appendChunks(c: org.apache.spark.sql.Dataset[EncodedChunk], commitId: String): Unit =
        io.appendChunks(c, commitId)
      def appendManifest(r: org.apache.spark.sql.DataFrame): Unit =
        throw new RuntimeException("simulated kill before manifest commit")
      def readChunks(s: SparkSession) = io.readChunks(s)
      def readManifest(s: SparkSession) = io.readManifest(s)
      override def dropOrphanCommits(s: SparkSession, keep: Set[String]): Unit =
        io.dropOrphanCommits(s, keep)
    }
    intercept[RuntimeException] { ResumableEncode.run(spark, input, crashing, "runX", opts) }
    assert(io.readChunks(spark).count() > 0, "orphan chunks expected after crash")
    assert(io.readManifest(spark).isEmpty, "no manifest rows expected after crash")
    // resume: orphans must be dropped before re-encode — no duplicates
    ResumableEncode.run(spark, input, io, "runX", opts)
    val decoded = EncodeJob.decode(io.readChunks(spark))
    assert(decoded.count() == input.count(), "orphans must not duplicate rows")
    val bad = decoded.toDF().alias("d").join(input.toDF().alias("i"), Seq("doc_id"), "full_outer")
      .filter(not(col("d.tokens") <=> col("i.tokens"))).count()
    assert(bad == 0)
  }

  test("resume with a different run_id against a committed table is refused") {
    val (input, _) = Tokenize.documents(spark, sf)
    val opts = EncodeOptions(numBuckets = 4, maxRowsPerChunk = 32, maxTokensPerChunk = 8192)
    val dir = java.nio.file.Files.createTempDirectory("graft_guard").toString
    val io = new ParquetTableIO(s"$dir/t")
    ResumableEncode.run(spark, input, io, "run1", opts)
    val before = io.readChunks(spark).count()
    // a new run_id must NOT silently delete run1's committed part_id dirs
    val e = intercept[IllegalArgumentException] {
      ResumableEncode.run(spark, input, io, "run2", opts)
    }
    assert(e.getMessage.contains("run1"))
    assert(io.readChunks(spark).count() == before, "guard must fire before any delete")
  }

  test("derived token tables cover dict/rle/for codecs end-to-end") {
    val qty = Tokenize.lineitemQuantities(spark, sf)
    val chunksQ = EncodeJob.encode(qty, EncodeOptions(numBuckets = 2)).cache()
    val codecsQ = chunksQ.collect().map(_.codec).toSet
    assert(codecsQ.nonEmpty)
    val decodedQ = EncodeJob.decode(chunksQ)
    val badQ = decodedQ.toDF().alias("d").join(qty.toDF().alias("i"), Seq("doc_id"), "full_outer")
      .filter(not(col("d.tokens") <=> col("i.tokens"))).count()
    assert(badQ == 0)

    val ev = Tokenize.eventTypes(spark, sf)
    val chunksE = EncodeJob.encode(ev, EncodeOptions(numBuckets = 2)).cache()
    val badE = EncodeJob.decode(chunksE).toDF().alias("d")
      .join(ev.toDF().alias("i"), Seq("doc_id"), "full_outer")
      .filter(not(col("d.tokens") <=> col("i.tokens"))).count()
    assert(badE == 0)
  }
}
