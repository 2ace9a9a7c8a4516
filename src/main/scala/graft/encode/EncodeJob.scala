package graft.encode

import graft.core._
import graft.format._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The encode job (SURVEY.md §3.4): read a token table, repartition by
  * explicit n_tok-aware buckets with salting for skewed sources, build
  * chunks inside mapPartitions (sample → stats → codec select → encode),
  * and write chunk + manifest tables.
  *
  * Partitioning (north_rule "partitioning / shuffle / skew handled
  * explicitly"): bucket = hash(source, log2-length-class, salt(doc_id)).
  * - same (source, length-class) rows cluster → compression locality, the
  *   Spark analog of the reference's block-local symbol tables
  *   (/root/reference/src/BenchmarkDriver.cpp:87-140);
  * - the salt term splits a heavy (source, length-class) cell across up to
  *   `saltBuckets` buckets → no straggler task at 100 TB;
  * - bucket ids are a pure function of the row → reruns assign identical
  *   buckets, which is what makes manifest-based resume exact.
  * Within a partition rows are locally sorted by (source, n_tok, doc_id) —
  * no extra shuffle — so each chunk sees one distribution and the output is
  * deterministic.
  */
final case class EncodeOptions(
    numBuckets: Int = 32,
    saltBuckets: Int = 16,
    maxRowsPerChunk: Int = 65536,
    maxTokensPerChunk: Long = 1L << 20,
    forceCodec: Option[String] = None,
    waves: Int = 1)

object EncodeJob {

  /** Deterministic bucket id for every row (the explicit repartition key). */
  def withBucket(df: DataFrame, opts: EncodeOptions): DataFrame = {
    val lenClass = floor(log2(greatest(col("n_tok").cast("double"), lit(1.0))))
    val salt = pmod(xxhash64(col("doc_id")), lit(opts.saltBuckets))
    df.withColumn("__bucket",
      pmod(xxhash64(col("source"), lenClass, salt), lit(opts.numBuckets)).cast("int"))
  }

  /** Shuffle rows to their buckets and locally order for chunk locality. */
  def plan(ds: Dataset[TokenRow], opts: EncodeOptions): Dataset[(Int, TokenRow)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    withBucket(ds.toDF(), opts)
      .repartition(opts.numBuckets, col("__bucket"))
      .sortWithinPartitions(col("__bucket"), col("source"), col("n_tok"), col("doc_id"))
      .select(col("__bucket"), struct(col("doc_id"), col("tokens"), col("n_tok"), col("source")).as("row"))
      .as[(Int, TokenRow)]
  }

  /** Pure encode: token rows → encoded chunks (no I/O). */
  def encode(ds: Dataset[TokenRow], opts: EncodeOptions = EncodeOptions()): Dataset[EncodedChunk] = {
    val spark = ds.sparkSession
    import spark.implicits._
    plan(ds, opts).mapPartitions { it => new ChunkIterator(it, opts) }
  }

  /** Decode every chunk back to token rows (bit-identical invariant). */
  def decode(chunks: Dataset[EncodedChunk]): Dataset[TokenRow] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.flatMap(ChunkOps.decodeAll)
  }

  /** Size accounting mirroring the reference (blob + offsets + header;
    * /root/reference/sketch.cc:746-755): returns (tokens, bytes, bytes/token).
    */
  def sizeReport(chunks: Dataset[EncodedChunk]): (Long, Long, Double) = {
    val row = chunks.toDF().agg(
      sum(col("n_tokens")),
      sum(length(col("data")) + length(col("symtab")) + length(col("offsets")))).collect()(0)
    val toks = row.getLong(0)
    val bytes = row.getLong(1)
    (toks, bytes, bytes.toDouble / math.max(toks, 1L))
  }
}

/** Buffers rows of one shuffle partition into chunks: a new chunk starts when
  * row/token limits are hit or the bucket changes (a partition can host
  * several buckets; chunks never span buckets so resume stays per-bucket).
  */
private final class ChunkIterator(it: Iterator[(Int, TokenRow)], opts: EncodeOptions)
    extends Iterator[EncodedChunk] {

  private var pending: (Int, TokenRow) = _
  private val seqInBucket = scala.collection.mutable.HashMap.empty[Int, Int]

  override def hasNext: Boolean = pending != null || it.hasNext

  override def next(): EncodedChunk = {
    if (pending == null) pending = it.next()
    val bucket = pending._1
    val docIds = scala.collection.mutable.ArrayBuffer.empty[String]
    val sources = scala.collection.mutable.ArrayBuffer.empty[String]
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    var tokens = 0L
    var done = false
    while (!done && pending != null && pending._1 == bucket) {
      val r = pending._2
      docIds += r.doc_id
      sources += r.source
      rows += r.tokens
      tokens += r.tokens.length
      pending = if (it.hasNext) it.next() else null
      if (rows.length >= opts.maxRowsPerChunk || tokens >= opts.maxTokensPerChunk) done = true
    }
    val seq = seqInBucket.getOrElse(bucket, 0)
    seqInBucket(bucket) = seq + 1
    ChunkOps.build((bucket.toLong << 24) | seq.toLong, bucket,
      docIds.toArray, sources.toArray, rows.toIndexedSeq, opts.forceCodec)
  }
}
