package graft.streaming

import graft.encode.{EncodeJob, EncodeOptions, TableIO}
import graft.format.{ManifestRow, TokenRow}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingestion for the token table: a `readStream` of TokenRows is
  * encoded micro-batch-at-a-time with the SAME batch encode path (explicit
  * bucket shuffle → chunk build) via foreachBatch, appending chunk files and
  * per-(batch, bucket) manifest rows. Combined with Spark's streaming
  * checkpoint, an interrupted stream resumes at the last committed batch and
  * the manifest records exactly which (batch_id, bucket) groups landed.
  *
  * The reference has no streaming surface (SURVEY.md §2.3); this is the
  * Spark-native extension point for continuous training-data ingestion.
  *
  * Delivery semantics: EXACTLY-ONCE against a commit-directory TableIO.
  * Batch replay after a crash is detected via the manifest (a batch whose
  * manifest rows exist is skipped); a crash BETWEEN the chunk append and
  * the manifest append leaves an orphan commit directory whose id is
  * deterministic per batch, so the replay's appendChunks(commitId =
  * batchRunId) OVERWRITES the partial files rather than duplicating them —
  * the plain-Parquet equivalent of the Iceberg snapshot commit documented
  * on TableIO.
  */
object StreamingEncode {

  /** Start encoding a streaming token Dataset into `io`. The caller owns the
    * stream source (file source, Kafka-shaped, or MemoryStream in tests).
    */
  def start(stream: Dataset[TokenRow], io: TableIO, runId: String,
            checkpointDir: String, opts: EncodeOptions = EncodeOptions()): StreamingQuery = {
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[TokenRow], batchId: Long) =>
        val spark = batch.sparkSession
        val batchRunId = s"$runId-batch-$batchId"
        // idempotence on replay: a batch whose manifest rows are already
        // committed is skipped wholesale (crash after manifest but before
        // the streaming checkpoint replays the batch)
        val alreadyCommitted = io.readManifest(spark).exists(
          _.filter(col("run_id") === batchRunId).limit(1).count() > 0)
        if (!alreadyCommitted) {
          // batchId + 1 in chunk_id's high bits: distinct from the batch
          // path's default tag 0 and from every other micro-batch
          val chunks = EncodeJob.encode(batch, opts.copy(jobTag = batchId + 1)).cache()
          try {
            // deterministic commit id per batch: a replayed batch rewrites
            // its own commit directory (exactly-once through the crash
            // window between chunk append and manifest append)
            io.appendChunks(chunks, batchRunId)
            // metrics of THIS batch's chunks only (aggregating the whole
            // table would cumulate prior batches into every manifest row)
            val written = chunks.toDF()
              .groupBy(col("part_id"))
              .agg(count(lit(1)).as("n_chunks"), sum(col("row_count")).as("rows"),
                sum(col("n_tokens")).as("tokens"),
                sum(length(col("data")) + length(col("symtab")) + length(col("offsets"))).as("bytes"))
              .collect()
            val now = System.currentTimeMillis()
            val rows = written.toSeq.map(r => ManifestRow(
              batchRunId, batchId, r.getInt(0), "committed",
              r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), now, batchRunId))
            if (rows.nonEmpty) io.appendManifest(spark.createDataFrame(rows))
          } finally chunks.unpersist()
        }
        ()
      }
      .start()
  }
}
