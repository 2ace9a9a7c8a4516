package graft.encode

import graft.format._
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-management boundary. The north_rule targets Iceberg-managed tables;
  * no Iceberg jar ships in this sandbox (SURVEY.md §7.1.3 — recorded
  * deviation), so `ParquetTableIO` implements the same commit semantics over
  * plain Parquet: chunk files appended per wave via Spark's job-level commit
  * protocol (all-or-nothing), then manifest rows appended only after the
  * chunk write succeeds. Swapping in Iceberg means reimplementing this trait
  * with `.writeTo(table).append()` — nothing above it changes.
  */
trait TableIO {
  /** Write one commit's chunk files under an isolated commit id. A commit
    * becomes durable only when a manifest row references its id; rewriting
    * the same commit id REPLACES that commit's files (replay idempotence).
    */
  def appendChunks(chunks: Dataset[EncodedChunk], commitId: String): Unit
  def appendManifest(rows: DataFrame): Unit
  def readChunks(spark: SparkSession): Dataset[EncodedChunk]
  def readManifest(spark: SparkSession): Option[DataFrame]
  /** Drop chunk files of commits NOT in `keep` — crashed attempts that never
    * reached the manifest. No-op unless implemented.
    */
  def dropOrphanCommits(spark: SparkSession, keep: Set[String]): Unit = {}
}

final class ParquetTableIO(root: String) extends TableIO {
  private val chunksDir = s"$root/chunks"
  private val manifestDir = s"$root/manifest"

  /** One flat directory of ~reduce-parallelism-sized files per commit
    * (`chunks/commit=<id>/`), NOT partitionBy(part_id): per-bucket Hive
    * partitioning puts every bucket in its own directory of tiny files,
    * which at 10^5–10^7 production buckets is a filesystem killer and
    * measurably taxed the 25× scan (SCALE.md §8: ~25% extra CPU/token from
    * the small-file layout alone). The commit directory IS the recovery
    * unit — the plain-Parquet analog of an Iceberg snapshot — and `commit`
    * surfaces as a partition column on read. Overwrite semantics make
    * rewriting the same commit id replace a crashed attempt's files.
    */
  def appendChunks(chunks: Dataset[EncodedChunk], commitId: String): Unit = {
    require(commitId.nonEmpty && commitId.forall(c =>
      c.isLetterOrDigit || c == '-' || c == '_' || c == '.'),
      s"commit id must be path-safe: $commitId")
    chunks.write.mode(SaveMode.Overwrite).parquet(s"$chunksDir/commit=$commitId")
  }

  /** Remove commit directories the manifest does not reference (a crash
    * between the chunk write and the manifest append leaves an orphan
    * commit) — called by ResumableEncode before re-encoding so a rerun
    * cannot duplicate rows. With Iceberg, the snapshot commit makes
    * chunk+manifest atomic and this step disappears.
    */
  override def dropOrphanCommits(spark: SparkSession, keep: Set[String]): Unit = {
    val base = new org.apache.hadoop.fs.Path(chunksDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return
    fs.listStatus(base).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("commit=") && !keep.contains(name.stripPrefix("commit=")))
        fs.delete(st.getPath, true)
    }
  }

  def appendManifest(rows: DataFrame): Unit =
    rows.write.mode(SaveMode.Append).parquet(manifestDir)

  def readChunks(spark: SparkSession): Dataset[EncodedChunk] = {
    import spark.implicits._
    spark.read.parquet(chunksDir).as[EncodedChunk]
  }

  def readManifest(spark: SparkSession): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(manifestDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(manifestDir)) else None
  }
}

/** Resumable encode: buckets are committed to the manifest in `waves`
  * (bucket % waves); a rerun of the same (input, options, run_id) skips every
  * bucket the manifest already records, drops any orphan chunk files of
  * uncommitted buckets (crash window between chunk append and manifest
  * append), and re-encodes only the rest. Bucket assignment is a pure
  * function of row content, so the decoded table always equals the input
  * exactly once per row; chunk boundaries within a re-encoded bucket may
  * legally differ across cluster runs (shuffle arrival order — the decode
  * invariant does not depend on them).
  */
object ResumableEncode {

  def run(spark: SparkSession, input: Dataset[TokenRow], io: TableIO, runId: String,
          opts: EncodeOptions = EncodeOptions()): Seq[ManifestRow] = {
    import spark.implicits._

    val doneBuckets: Set[Int] = io.readManifest(spark) match {
      case Some(m) =>
        // Single-run-per-table contract: dropBuckets deletes whole part_id
        // directories, so resuming a DIFFERENT run against a table that
        // already has committed rows would destroy the other run's data and
        // corrupt per-bucket metrics. Refuse instead of silently deleting.
        val otherRuns = m.filter(col("run_id") =!= runId)
          .select("run_id").distinct().collect().map(_.getString(0))
        require(otherRuns.isEmpty,
          s"table already holds committed runs ${otherRuns.mkString(", ")}; " +
            s"ResumableEncode resumes one run per table — use a fresh table " +
            s"root or the original run_id (got: $runId)")
        m.filter(col("run_id") === runId && col("status") === "committed")
          .select("part_id").distinct().collect().map(_.getInt(0)).toSet
      case None => Set.empty
    }

    // heal the crash window: any chunk commit the manifest does not
    // reference is a crashed attempt's leftovers — delete it before
    // re-encoding those buckets (duplicate-free resume)
    val keepCommits: Set[String] = io.readManifest(spark) match {
      case Some(m) => m.filter(col("status") === "committed")
        .select("commit_id").distinct().collect().map(_.getString(0)).toSet
      case None => Set.empty
    }
    io.dropOrphanCommits(spark, keepCommits)

    val committed = scala.collection.mutable.ArrayBuffer.empty[ManifestRow]
    // Waves take CONTIGUOUS bucket ranges, not mod-classes: the reduce
    // partitioner is bucket mod P, so a mod-`waves` wave would collide with
    // it and land every wave's buckets on numPartitions/gcd(waves,P) reduce
    // tasks (measured at the 10× scale-up: 8 of 32 tasks did all the work,
    // med task ≈0 s vs max 9–17 s). A contiguous range covers all residues
    // mod P whenever the range is ≥P, so every wave balances. Wave
    // membership stays a pure function of bucket id — resume is unchanged
    // (doneBuckets subtracts by bucket, wave is lineage metadata).
    val bucketsPerWave = math.max(1, (opts.numBuckets + opts.waves - 1) / opts.waves)
    var wave = 0
    while (wave < opts.waves) {
      val waveBuckets = (0 until opts.numBuckets)
        .filter(b => b / bucketsPerWave == wave)
      val todo = waveBuckets.filterNot(doneBuckets)
      if (todo.nonEmpty) {
        val todoSet = todo.toSet
        // attempt-unique commit id: a crashed attempt's id never reaches the
        // manifest, so the next resume's dropOrphanCommits removes its files
        val commitId = s"$runId-w$wave-${java.util.UUID.randomUUID().toString.take(8)}"
        // bucket filter INSIDE encode: one bucket computation, and a
        // bare-scan input keeps the columnar pack path (Buckets.of is
        // bit-identical to the SQL expression — BucketSpec pins it)
        val t0 = System.nanoTime()
        val chunks = EncodeJob.encode(input, opts.copy(onlyBuckets = Some(todoSet)))
        io.appendChunks(chunks, commitId)
        val ms = (System.nanoTime() - t0) / 1000000L
        // lineage + metrics per bucket, from the committed chunk table
        val written = io.readChunks(spark).toDF()
          .filter(col("part_id").isin(todoSet.toSeq.map(Integer.valueOf): _*))
          .groupBy(col("part_id"))
          .agg(count(lit(1)).as("n_chunks"), sum(col("row_count")).as("rows"),
            sum(col("n_tokens")).as("tokens"),
            sum(length(col("data")) + length(col("symtab")) + length(col("offsets"))).as("bytes"))
          .collect()
        val now = System.currentTimeMillis()
        val rows = todo.map { b =>
          written.find(_.getInt(0) == b) match {
            case Some(r) => ManifestRow(runId, wave, b, "committed",
              r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), now, commitId)
            case None => ManifestRow(runId, wave, b, "committed", 0L, 0L, 0L, 0L, now, commitId)
          }
        }
        io.appendManifest(spark.createDataFrame(rows))
        committed ++= rows
        val _ = ms
      }
      wave += 1
    }
    committed.toSeq
  }
}
