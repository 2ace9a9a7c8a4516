package graft.streaming

import graft.format.TokenRow
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication: keep only the FIRST occurrence of each
  * token content across the whole stream, with the seen-set held in Spark's
  * keyed streaming state (flatMapGroupsWithState) — the streaming complement
  * of Dedup.exact for continuous ingestion, where a batch groupBy cannot see
  * earlier micro-batches.
  *
  * Keying: a 128-bit content hash (two independently-seeded mixes of the
  * token array), not the array itself, so the distributed state store holds
  * 16 bytes + overhead per distinct document rather than the payload; at
  * 10^12 documents the collision odds stay below n²/2^129 ≈ 10⁻¹⁵.
  * State never expires (NoTimeout): the dedup horizon IS the job lifetime,
  * and the state store scales horizontally with shuffle partitions. For a
  * bounded horizon, swap in an event-time timeout at the call site.
  *
  * Within one micro-batch the kept occurrence is the min doc_id of the
  * group — deterministic under replay, so a crash-restart (streaming
  * checkpoint + state store) emits the same survivors.
  */
object StreamingDedup {

  /** splitmix64 finalizer (public domain constant set; same mix the
    * sampling/fingerprint kernels use).
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 128-bit content key: two polynomial accumulations with independent
    * seeds, each element mixed — order- and length-sensitive.
    */
  def contentKey(tokens: Array[Int]): (Long, Long) = {
    var a = mix64(0x6a09e667f3bcc908L)
    var b = mix64(0xbb67ae8584caa73bL)
    var i = 0
    while (i < tokens.length) {
      a = mix64(a ^ tokens(i))
      b = mix64(b + tokens(i) * 0x9e3779b97f4a7c15L + 1)
      i += 1
    }
    (a ^ tokens.length.toLong, b)
  }

  /** First-occurrence filter over a streaming Dataset. Run with
    * outputMode("append") and a checkpointLocation; state survives restarts.
    */
  def firstOccurrences(stream: Dataset[TokenRow]): Dataset[TokenRow] = {
    import stream.sparkSession.implicits._
    stream
      .groupByKey(r => contentKey(r.tokens))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Long, Long), rows: Iterator[TokenRow], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            var first: TokenRow = null
            while (rows.hasNext) {
              val r = rows.next()
              if (first == null || r.doc_id < first.doc_id) first = r
            }
            Iterator.single(first)
          }
        })
  }
}
