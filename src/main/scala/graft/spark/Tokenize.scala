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

  /** Exact word vocabulary: distinct words, sorted → dense int ids. The
    * collect is bounded by vocabulary size (tiny vs corpus), not corpus size.
    */
  def vocabulary(docs: DataFrame): Map[String, Int] =
    docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct().orderBy("w")
      .collect().map(_.getString(0)).zipWithIndex.toMap

  def tokensColumn(vocab: Map[String, Int], text: Column): Column = {
    val m = typedLit(vocab)
    transform(
      filter(split(trim(text), "\\s+"), w => w =!= lit("")),
      w => element_at(m, w).cast("int"))
  }

  /** documents.parquet → token table. */
  def documents(spark: SparkSession, sfDir: String): (Dataset[TokenRow], Map[String, Int]) = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val vocab = vocabulary(docs)
    val ds = docs.select(
      col("doc_id").cast("string").as("doc_id"),
      tokensColumn(vocab, col("text")).as("tokens"),
      col("source"))
      .withColumn("n_tok", size(col("tokens")))
      .select("doc_id", "tokens", "n_tok", "source")
      .as[TokenRow]
    (ds, vocab)
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
