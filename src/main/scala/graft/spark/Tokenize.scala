package graft.spark

import graft.format.TokenRow
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, Dataset, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** tokenize_words(text): whitespace-split `text` and map each word through
  * the BROADCAST corpus vocabulary to its dense id — one pass over the
  * string bytes per row, no explode, no join, no shuffle. Replaces the
  * round-1 posexplode ⋈ vocab ⋈ regroup plan, whose groupBy(doc_id) +
  * collect_list shuffled every (pos, id) struct of the corpus (~20 B/token
  * through the exchange) and re-sorted every document — tokenization was
  * the dominant cost of every token-table consumer (guide §2.4: remove
  * shuffles outright). The vocabulary stays DATA (a broadcast value, like
  * the old broadcast-joined table), never a serialized literal in the plan.
  * Word splitting is byte-level on the 6 ASCII whitespace chars of java
  * regex \s ([ \t\n\x0B\f\r]) — multi-byte UTF-8 chars never contain ASCII
  * bytes, so this equals split(trim(text), "\\s+") + drop-empties exactly.
  * Words absent from the vocabulary are dropped (the old inner join's
  * semantics; the corpus vocabulary contains every corpus word, so this
  * never fires on derived inputs).
  */
case class TokenizeWords(child: Expression, vocab: Broadcast[Array[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "tokenize_words"

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def tokenize(text: UTF8String): ArrayData = {
    val lookup = TokenizeWords.lookupFor(vocab)
    val bytes = text.getBytes
    val len = bytes.length
    var out = new Array[Int](math.max(len >> 3, 8))
    var n = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val start = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > start) {
        val id = lookup.get(UTF8String.fromBytes(bytes, start, i - start))
        if (id != null) {
          if (n == out.length) out = java.util.Arrays.copyOf(out, n << 1)
          out(n) = id.intValue()
          n += 1
        }
      }
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (n == out.length) out else java.util.Arrays.copyOf(out, n))
  }

  override protected def nullSafeEval(v: Any): Any = tokenize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenizer", this, classOf[TokenizeWords].getName)
    defineCodeGen(ctx, ev, c => s"$ref.tokenize($c)")
  }

  override protected def withNewChildInternal(c: Expression): TokenizeWords = copy(child = c)
}

object TokenizeWords {
  // word → id map built once per JVM per broadcast (tasks deserialize their
  // own expression instances; the map is vocab-sized and shared)
  private val maps =
    new java.util.concurrent.ConcurrentHashMap[Long, java.util.HashMap[UTF8String, Integer]]()
  private[spark] def lookupFor(b: Broadcast[Array[String]]): java.util.HashMap[UTF8String, Integer] =
    maps.computeIfAbsent(b.id, _ => {
      val words = b.value
      val m = new java.util.HashMap[UTF8String, Integer](words.length * 2)
      var i = 0
      while (i < words.length) { m.put(UTF8String.fromString(words(i)), Integer.valueOf(i)); i += 1 }
      m
    })
}

/** Deterministic derivations of the north-rule input shape
  * (doc_id:string, tokens:array<int32>, n_tok:int32, source:string) from the
  * driver-provided testdata tables (TESTDATA.md — we derive, never
  * synthesize). The documents corpus is the analog of the reference's
  * l_comment / p_type string corpora (/root/reference/scripts/data-setup.sh:14-18),
  * word-tokenized against an exact corpus vocabulary so every token-domain
  * predicate has a faithful string-LIKE oracle.
  */
object Tokenize {

  /** Unsigned UTF-8 byte comparison — the driver-side replica of Spark's
    * UTF8String (and DuckDB's) string order, used to sort the collected
    * vocabulary without a cluster-side orderBy (String.compareTo diverges
    * on supplementary-plane code points: UTF-16 surrogates sort below
    * 3-byte BMP sequences, UTF-8 bytes sort above). EncodeSpec pins this
    * against the distributed orderBy on adversarial words.
    */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val lim = math.min(x.length, y.length)
    var c = 0
    while (i < lim && c == 0) { c = (x(i) & 0xff) - (y(i) & 0xff); i += 1 }
    if (c != 0) c else x.length - y.length
  }

  /** word → dense-id vocabulary TABLE (distinct words in sorted order,
    * ids via zipWithIndex — a fully distributed 2-pass assignment, no
    * driver materialization and nothing embedded in any plan).
    */
  def vocabularyDf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sorted = docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct().orderBy("w")
      .as[String].rdd.zipWithIndex()
    spark.createDataFrame(sorted.map { case (w, i) => (w, i.toInt) }).toDF("w", "id")
  }

  /** Driver-side word→id Map — for building pattern literals and test
    * oracles ONLY (a handful of lookups). Bounded by vocabulary size; the
    * corpus tokenization below never routes through it.
    */
  def vocabulary(docs: DataFrame): Map[String, Int] =
    vocabularyDf(docs).collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  // One tokenization per (session, dir): every driver query routes through
  // documents(), and an un-memoized call ran the vocabulary job EAGERLY
  // (driver Map collect) each time. Keyed by session because the cached
  // vocabDf is bound to the session that built it; entries for stopped
  // sessions are evicted on access (Bench cycles many sessions in one JVM).
  private val docCache =
    scala.collection.mutable.HashMap.empty[(SparkSession, String), (Dataset[TokenRow], Map[String, Int])]

  /** documents.parquet → token table, via the TokenizeWords expression over
    * a BROADCAST vocabulary: one byte-level pass per row, no explode, no
    * join, no shuffle — the round-1 posexplode ⋈ vocab ⋈ groupBy plan
    * shuffled ~20 B/token of (pos, id) structs and re-sorted every document
    * on EVERY pass, and was the dominant cost of every token-table consumer
    * (guide §2.4). The vocabulary stays data (broadcast value, not plan).
    * Ids are identical to vocabularyDf's: sorted distinct words, rank ids.
    *
    * The resulting Dataset is CACHED (per session+dir, evicted with the
    * session): a dozen driver queries — several of which reference the
    * token table two or three times inside one plan — re-tokenized the
    * corpus from parquet on every action. The first consumer pays the
    * one materialization inside its own timed region (the same contract as
    * Queries.chunkCache).
    */
  def documents(spark: SparkSession, sfDir: String): (Dataset[TokenRow], Map[String, Int]) = synchronized {
    docCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    docCache.getOrElseUpdate((spark, sfDir), {
      import spark.implicits._
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      // one distributed distinct pass; the SORT happens on the driver over
      // the collected array (the driver Map half of this API always
      // materialized the vocabulary anyway, and a cluster-side orderBy on
      // an about-to-be-collected frame costs a sampling job + a range
      // exchange for nothing — guide §2.4). Order = unsigned UTF-8 byte
      // comparison, identical to Spark's UTF8String / DuckDB's BLOB-wise
      // string order, so ids stay exactly vocabularyDf's rank assignment
      // (String.compareTo would diverge on non-BMP code points).
      val sortedWords = docs
        .select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .filter(col("w") =!= "").distinct()
        .as[String].collect()
      java.util.Arrays.sort(sortedWords, (a: String, b: String) => utf8Compare(a, b))
      val vmap = sortedWords.iterator.zipWithIndex.toMap
      val bc = spark.sparkContext.broadcast(sortedWords)
      val ds = docs
        .select(
          col("doc_id").cast("string").as("doc_id"),
          // null text → empty tokens, like the old left join + coalesce
          coalesce(GraftBridge.column(
              TokenizeWords(GraftBridge.expression(col("text")), bc)),
            array().cast("array<int>")).as("tokens"),
          col("source"))
        .withColumn("n_tok", size(col("tokens")))
        .select("doc_id", "tokens", "n_tok", "source")
        .as[TokenRow]
        .cache()
      (ds, vmap)
    })
  }

  /** lineitem-derived narrow-int token table (quantities are 1..50 →
    * exercises dict / bit-pack / FoR selection): one row per order, tokens =
    * quantities of its lines in line order.
    */
  def lineitemQuantities(spark: SparkSession, sfDir: String): Dataset[TokenRow] = {
    import spark.implicits._
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.groupBy(col("l_orderkey"))
      .agg(transform(array_sort(collect_list(struct(col("l_linenumber"), col("l_quantity")))),
        s => s.getField("l_quantity").cast("int")).as("tokens"))
      .select(col("l_orderkey").cast("string").as("doc_id"), col("tokens"),
        size(col("tokens")).as("n_tok"), lit("lineitem_qty").as("source"))
      .as[TokenRow]
  }

  /** events-derived token table with long runs (event_type ids repeat in
    * bursts per user) → exercises RLE.
    */
  def eventTypes(spark: SparkSession, sfDir: String): Dataset[TokenRow] = {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val typeIds = ev.select(col("event_type")).distinct().orderBy("event_type")
      .collect().map(_.getString(0)).zipWithIndex.toMap
    val m = typedLit(typeIds)
    ev.groupBy(col("user_id"))
      .agg(transform(array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
        s => element_at(m, s.getField("event_type")).cast("int")).as("tokens"))
      .select(col("user_id").cast("string").as("doc_id"), col("tokens"),
        size(col("tokens")).as("n_tok"), lit("event_types").as("source"))
      .as[TokenRow]
  }
}
