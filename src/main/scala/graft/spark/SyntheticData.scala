package graft.spark

import graft.format.TokenRow
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic token table for throughput/scaling benches
  * (FIXTURES.md §1): generated in parallel with a splittable counter-based
  * RNG keyed by row id (seed 42), so any cluster size produces the same
  * table. Five sources stress the five codecs; `skew` concentrates ~50% of
  * all tokens in one source with docs up to 100× the median length — the
  * salting/bucketing stress case (SURVEY.md §7.3.3).
  */
object SyntheticData {

  // splitmix64: pure function of (seed, counter) — deterministic and parallel
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private final class Rng(seed: Long) {
    private var ctr = seed
    def nextLong(): Long = { ctr += 1; mix(ctr) }
    def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
    def nextInt(bound: Int): Int = (nextDouble() * bound).toInt
  }

  private val Sources = Array("zipf", "lowcard", "runs", "narrow", "skew")

  /** 64 hot phrases of 2–8 tokens (the 20%-injection corpus shape of the
    * reference's prototype, algorithm.ipynb cell-1).
    */
  private def phrases(seed: Long, vocab: Int): Array[Array[Int]] = {
    val r = new Rng(seed)
    Array.fill(64)(Array.fill(2 + r.nextInt(7))(r.nextInt(vocab)))
  }
  private val ZipfVocab = 32000
  @transient private lazy val hotPhrases = phrases(987654321L, ZipfVocab)

  /** A phrase planted in zipf/skew docs — the bench pattern (`%special%`). */
  def hotPhrase(i: Int): Array[Int] = hotPhrases(i % 64).clone()
  @transient private lazy val lowcardVals = {
    val r = new Rng(192837465L)
    Array.fill(200)(r.nextInt(1 << 28))
  }

  def row(id: Long): TokenRow = {
    val r = new Rng(id * 1000003L + 42L)
    val source = Sources((id % Sources.length).toInt)
    // lognormal-ish doc length, median 64
    val g = math.sqrt(-2.0 * math.log(r.nextDouble() + 1e-12)) *
      math.cos(2.0 * math.Pi * r.nextDouble())
    var n = math.max(1, (64.0 * math.exp(0.6 * g)).toInt)
    if (source == "skew") {
      // heavy tail: ~10% of skew docs are 20–100× median
      if (r.nextDouble() < 0.10) n = 64 * (20 + r.nextInt(81))
      else n = n * 4
    }
    val toks = new Array[Int](n)
    source match {
      case "zipf" | "skew" =>
        var i = 0
        while (i < n) {
          if (r.nextDouble() < 0.2) {
            val ph = hotPhrases(r.nextInt(64))
            var j = 0
            while (j < ph.length && i < n) { toks(i) = ph(j); i += 1; j += 1 }
          } else {
            val u = r.nextDouble()
            toks(i) = (ZipfVocab * u * u * u).toInt
            i += 1
          }
        }
      case "lowcard" =>
        var i = 0
        while (i < n) { toks(i) = lowcardVals(r.nextInt(200)); i += 1 }
      case "runs" =>
        var i = 0
        var v = r.nextInt(1000)
        while (i < n) {
          if (r.nextDouble() < 0.05) v = r.nextInt(1000)
          toks(i) = v
          i += 1
        }
      case "narrow" =>
        val base = r.nextInt(1 << 24)
        var i = 0
        while (i < n) { toks(i) = base + r.nextInt(256); i += 1 }
    }
    TokenRow(f"doc-$source-$id%010d", toks, n, source)
  }

  def tokenTable(spark: SparkSession, rows: Long, partitions: Int = 64): Dataset[TokenRow] = {
    import spark.implicits._
    spark.range(0L, rows, 1L, partitions).map((l: java.lang.Long) => row(l.longValue))
  }

  /** Deterministic synthetic embedding table (vec_id, embedding:
    * array<float>[dims]) — uniform [-1,1) components from
    * splitmix64(vec_id·131071 + dim), same everywhere like tokenTable.
    */
  def embTable(spark: SparkSession, rows: Long, dims: Int,
               partitions: Int = 64): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(0L, rows, 1L, partitions).map { (l: java.lang.Long) =>
      val id = l.longValue
      val out = new Array[Float](dims)
      var d = 0
      while (d < dims) {
        val u = (mix(id * 131071L + d) >>> 11).toDouble / (1L << 53).toDouble
        out(d) = (u * 2.0 - 1.0).toFloat
        d += 1
      }
      (id, out)
    }.toDF("vec_id", "embedding")
  }
}
