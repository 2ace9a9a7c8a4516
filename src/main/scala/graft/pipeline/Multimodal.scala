package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` + typed metadata.
  *
  * The Spark-side plumbing here is real and tested — schema, explicit
  * repartitioning before the expensive stage, batched per-partition
  * processing (the Scala analog of `mapInPandas`: one iterator in, batches
  * processed, one iterator out). The pixel/sample decode itself is a
  * clearly-marked DETERMINISTIC STUB (`fakeDecode`) because no image/audio
  * libraries ship in this container; a real deployment replaces exactly that
  * one function with (e.g.) a JNI/opencv call and nothing else changes.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, media: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Int,
                                 width: Int, height: Int, n_frames: Int,
                                 feature: Array[Float])

  /** Derive a deterministic media table from the documents corpus: the text
    * payload plays the role of an opaque encoded blob.
    */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
  }

  /** STUB decode: a pure, deterministic stand-in for an image/audio decoder.
    * Parses "dimensions" out of the blob bytes. Replace THIS function with
    * the real decoder; everything around it (batching, schema, partitioning)
    * is production-shaped.
    */
  private[pipeline] def fakeDecode(kind: String, media: Array[Byte]): (Int, Int, Int) = {
    val h0 = if (media.length > 0) (media(0) & 0xff) else 0
    val h1 = if (media.length > 1) (media(1) & 0xff) else 0
    kind match {
      case "image" => (64 + h0 % 64, 64 + h1 % 64, 1)
      case "audio" => (1, 1, 1 + media.length % 100)       // n_frames ~ samples
      case _       => (64 + h0 % 64, 64 + h1 % 64, 1 + media.length % 30)
    }
  }

  /** Feature extraction over media blobs: repartition so the expensive stage
    * parallelizes by media_id (not by input file layout), then process each
    * partition as a batch — the mapInPandas shape.
    */
  def extractFeatures(media: Dataset[MediaRow], partitions: Int = 32): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.repartition(partitions, col("media_id"))
      .mapPartitions { batch =>
        batch.map { r =>
          val (w, h, frames) = fakeDecode(r.kind, r.media)
          // deterministic fake embedding from blob bytes (8 dims)
          val feat = new Array[Float](8)
          var i = 0
          while (i < r.media.length) {
            feat(i % 8) += (r.media(i) & 0xff) / 255.0f
            i += 1
          }
          MediaFeatures(r.media_id, r.kind, r.media.length, w, h, frames, feat)
        }
      }
  }

  /** Frame sampling: every nth frame index, bounded — pure metadata op. */
  def frameSample(features: Dataset[MediaFeatures], everyNth: Int, maxFrames: Int): DataFrame =
    features.toDF().select(col("media_id"), col("kind"), col("n_frames"),
      slice(sequence(lit(0), col("n_frames") - 1, lit(everyNth)), 1, maxFrames).as("frame_idx"))

  /** "Resize" planner: target dims per media row — metadata-only here, the
    * real pixel op would live in the batch stage above.
    */
  def resizePlan(features: Dataset[MediaFeatures], maxSide: Int): DataFrame =
    features.toDF().withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")).cast("double")))
      .select(col("media_id"),
        round(col("width") * col("scale")).cast("int").as("out_w"),
        round(col("height") * col("scale")).cast("int").as("out_h"))
}
