package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic mixture sampling for training-data pipelines: domain
  * re-weighting ("30% web, 80% curated") implemented as a pure per-row
  * predicate, not a rand() sample.
  *
  * Scale notes (100 TB): the keep/drop decision is
  * `splitmix64(doc_id) mod 100 < rate(source)` — a codegen'd scalar on the
  * scan, no shuffle, no state. Because it is a pure function of the row it
  * is exactly-once under task retry and speculative execution, stable
  * across reruns (incremental pipelines re-derive the same subset), and
  * composable: lowering a source's rate later yields a SUBSET of the
  * earlier sample (bucket < 30 ⊂ bucket < 80), which makes down-sampling
  * reproducible without reshuffling data.
  */
object Sampling {

  /** Keep each row iff its sample bucket (unsigned splitmix64(doc_id) mod
    * `mod`) falls below its source's percentage. Sources absent from
    * `ratesPct` use `defaultPct`.
    */
  def stratified(docs: DataFrame, ratesPct: Map[String, Int],
                 defaultPct: Int, mod: Int = 100): DataFrame = {
    val rate = ratesPct.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (src, p)) => when(col("source") === src, lit(p)).otherwise(acc)
    }
    docs.filter(PipelineFunctions.sampleBucket(col("doc_id"), mod) < rate)
  }
}
