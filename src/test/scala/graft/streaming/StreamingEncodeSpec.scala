package graft.streaming

import graft.encode.ParquetTableIO
import graft.encode.EncodeJob
import graft.format.TokenRow
import graft.spark.Tokenize
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingEncodeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming encode: file-source micro-batches land chunks + manifest, decode matches input") {
    import spark.implicits._
    val (input, _) = Tokenize.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    // stage the input as a file stream source (two files → ≥1 micro-batch)
    input.repartition(2).write.parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(input.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
      .as[TokenRow]
    val io = new ParquetTableIO(s"$dir/table")
    val q = StreamingEncode.start(stream, io, "stream1", s"$dir/ckpt")
    q.awaitTermination(120000)
    // all rows present and bit-identical after decode
    val decoded = EncodeJob.decode(io.readChunks(spark))
    val bad = decoded.toDF().alias("d")
      .join(input.toDF().alias("i"), Seq("doc_id"), "full_outer")
      .filter(not(col("d.tokens") <=> col("i.tokens"))).count()
    assert(bad == 0)
    assert(decoded.count() == input.count())
    val manifest = io.readManifest(spark).get
    assert(manifest.count() > 0)
    assert(manifest.filter(col("status") === "committed").count() == manifest.count())
  }

  test("streaming micro-batch debris compacts across batches (cross-header fsst transcode)") {
    import spark.implicits._
    val (input, _) = Tokenize.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_compact").toString
    input.repartition(4).write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(input.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in").as[TokenRow]
    val io = new ParquetTableIO(s"$dir/table")
    // fsst forced: every micro-batch trains its own symbol tables, so the
    // cross-batch debris can only merge through the transcode path
    val q = StreamingEncode.start(stream, io, "sc1", s"$dir/ckpt",
      graft.encode.EncodeOptions(numBuckets = 2, forceCodec = Some("fsst")))
    q.awaitTermination(120000)
    val small = io.readChunks(spark).toDF()
    val nSmall = small.count()
    val compacted = graft.encode.Compact.compact(small).toDF().cache()
    val nComp = compacted.count()
    assert(nComp < nSmall, s"cross-batch debris must merge ($nSmall -> $nComp chunks)")
    // bit-identical decode after the merge
    val decoded = EncodeJob.decodeDf(compacted)
    assert(decoded.count() == input.count())
    val bad = decoded.alias("d")
      .join(input.toDF().alias("i"), Seq("doc_id"), "full_outer")
      .filter(not(col("d.tokens") <=> col("i.tokens"))).count()
    assert(bad == 0, "compacted streaming table must decode bit-identical")
  }

  test("streaming restart resumes from checkpoint without duplicating batches") {
    import spark.implicits._
    val (input, _) = Tokenize.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_restart").toString
    input.repartition(3).write.parquet(s"$dir/in")
    def mkStream = spark.readStream.schema(input.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in").as[TokenRow]
    val io = new ParquetTableIO(s"$dir/table")
    // first run: die on the second micro-batch AFTER batch 0 committed
    val failing = new graft.encode.TableIO {
      var batches = 0
      def appendChunks(c: org.apache.spark.sql.Dataset[graft.format.EncodedChunk], commitId: String): Unit = {
        if (batches >= 1) throw new RuntimeException("simulated stream crash")
        io.appendChunks(c, commitId)
      }
      def appendManifest(r: org.apache.spark.sql.DataFrame): Unit = { io.appendManifest(r); batches += 1 }
      def readChunks(s: SparkSession) = io.readChunks(s)
      def readManifest(s: SparkSession) = io.readManifest(s)
    }
    val q1 = StreamingEncode.start(mkStream, failing, "s1", s"$dir/ckpt")
    intercept[Exception] { q1.awaitTermination() }
    val afterCrash = EncodeJob.decode(io.readChunks(spark)).count()
    assert(afterCrash > 0 && afterCrash < input.count(), s"partial expected, got $afterCrash")
    // restart with the same checkpoint: only unprocessed batches run
    val q2 = StreamingEncode.start(mkStream, io, "s1", s"$dir/ckpt")
    q2.awaitTermination(120000)
    val decoded = EncodeJob.decode(io.readChunks(spark))
    assert(decoded.count() == input.count(), "restart must complete exactly once")
    assert(decoded.select("doc_id").distinct().count() == input.count(), "no duplicates")
    val bad = decoded.toDF().alias("d").join(input.toDF().alias("i"), Seq("doc_id"))
      .filter(not(col("d.tokens") <=> col("i.tokens"))).count()
    assert(bad == 0)
  }
}
