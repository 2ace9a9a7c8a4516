package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dedup/fingerprint kernels as native Catalyst expressions (eval-mode) —
  * the building blocks for MinHash/SimHash/winnowing over the `tokens`
  * column. All hashing is splitmix64-derived and seed-deterministic, so
  * signatures are reproducible across runs and cluster sizes.
  */
object Hashing {
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** shingle_hashes(tokens, n): sorted distinct 64-bit hashes of all n-token
  * shingles — the set representation for Jaccard/MinHash.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData].toIntArray()
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n) { h = Hashing.mix64(h ^ toks(i + j)); j += 1 }
      out(i) = h
      i += 1
    }
    val distinct = out.distinct
    java.util.Arrays.sort(distinct)
    new GenericArrayData(distinct)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** minhash_sig(shingles, k, seed): k-permutation MinHash signature. */
case class MinHashSig(child: Expression, k: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(v: Any): Any = {
    val shingles = v.asInstanceOf[ArrayData].toLongArray()
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val hseed = Hashing.mix64(seed + i)
      var min = Long.MaxValue
      var j = 0
      while (j < shingles.length) {
        val h = Hashing.mix64(shingles(j) ^ hseed)
        if (h < min) min = h
        j += 1
      }
      sig(i) = min // empty set → MaxValue sentinel (only equal to other empties)
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** simhash64(tokens): 64-bit SimHash over unigram token hashes. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData].toIntArray()
    val acc = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = Hashing.mix64(toks(i).toLong)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sig)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** winnow_fingerprint(tokens, k, w): winnowing document fingerprint —
  * k-gram rolling hashes, minimum per window of w, distinct sorted. Standard
  * winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03) over the token alphabet.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"
  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData].toIntArray()
    if (toks.length < k) return new GenericArrayData(Array.empty[Long])
    val m = toks.length - k + 1
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) { h = Hashing.mix64(h ^ toks(i + j)); j += 1 }
      hashes(i) = h
      i += 1
    }
    val sel = scala.collection.mutable.SortedSet.empty[Long]
    var win = 0
    val lastWin = math.max(m - w, 0)
    while (win <= lastWin) {
      // minimum in UNSIGNED 64-bit order (hashes are unsigned values carried
      // in signed longs; -1L is the unsigned maximum) — keeps the selection
      // rule identical to any standard-integer reimplementation (the SQL
      // oracle compares UBIGINT).
      var min = -1L
      var j = win
      val end = math.min(win + w, m)
      while (j < end) {
        if (java.lang.Long.compareUnsigned(hashes(j), min) < 0) min = hashes(j)
        j += 1
      }
      sel += min
      win += 1
    }
    new GenericArrayData(sel.toArray)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** cosine_sim(a, b) over float arrays — a primitive-loop expression; the
  * higher-order-function formulation (zip_with + aggregate) measured ~0.5 ms
  * per pair, which makes exact pair joins infeasible.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toFloatArray()
    val b = r.asInstanceOf[ArrayData].toFloatArray()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** lsh_buckets(emb): random-hyperplane sign buckets for nTables independent
  * tables of nBits each — one primitive pass per row instead of
  * nTables × nBits higher-order aggregates.
  */
case class LshBuckets(child: Expression, nBits: Int, nTables: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"
  override protected def nullSafeEval(v: Any): Any = {
    val emb = v.asInstanceOf[ArrayData].toFloatArray()
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var b = 0
      while (b < nBits) {
        var dot = 0.0
        var d = 0
        while (d < emb.length) {
          val sign = if ((Hashing.mix64(seed + 1000L * t + b.toLong * 131071L + d) & 1L) == 1L) 1.0 else -1.0
          dot += emb(d) * sign
          d += 1
        }
        if (dot >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** sign_dots(emb): dot products of the embedding against nCentroids
  * deterministic ±1 sign vectors (centroid t, dim d: sign of
  * mix64(seed + 1000t + d) & 1). The coarse quantizer for the
  * SQL-reproducible IVF variant: cell = argmax dot (all sign centroids have
  * equal norm, so argmax dot = argmin L2).
  */
case class SignDots(child: Expression, nCentroids: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sign_dots"
  override protected def nullSafeEval(v: Any): Any = {
    val emb = v.asInstanceOf[ArrayData].toFloatArray()
    val out = new Array[Double](nCentroids)
    var t = 0
    while (t < nCentroids) {
      var dot = 0.0
      var d = 0
      while (d < emb.length) {
        val sign = if ((Hashing.mix64(seed + 1000L * t + d) & 1L) == 1L) 1.0 else -1.0
        dot += emb(d) * sign
        d += 1
      }
      out(t) = dot
      t += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** sample_bucket(id, m): splitmix64(id) mod m, UNSIGNED — the deterministic
  * sampling key for stratified mixture sampling. A pure function of the row,
  * so the keep/drop decision is reproducible under task retry and speculative
  * execution (a rand() sample is not exactly-once there), uniform regardless
  * of id structure, and engine-portable: unsigned remainder matches DuckDB's
  * `UBIGINT % m`, so the oracle reproduces the decision bit-for-bit.
  */
case class SampleBucket(child: Expression, m: Int) extends UnaryExpression
    with ExpectsInputTypes {
  require(m > 0, "modulus must be positive")
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sample_bucket"
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Long.remainderUnsigned(Hashing.mix64(v.asInstanceOf[Long]), m.toLong).toInt
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c =>
      s"(int) java.lang.Long.remainderUnsigned(graft.pipeline.Hashing.mix64($c), ${m}L)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object PipelineFunctions {
  import GraftBridge.{column => mk, expression => ex}
  def shingleHashes(tokens: Column, n: Int): Column = mk(ShingleHashes(ex(tokens), n))
  def sampleBucket(id: Column, m: Int): Column = mk(SampleBucket(ex(id), m))
  def minhashSig(shingles: Column, k: Int, seed: Long): Column = mk(MinHashSig(ex(shingles), k, seed))
  def simhash64(tokens: Column): Column = mk(SimHash64(ex(tokens)))
  def winnowFingerprint(tokens: Column, k: Int, w: Int): Column = mk(WinnowFingerprint(ex(tokens), k, w))
  def cosineSim(a: Column, b: Column): Column = mk(CosineSim(ex(a), ex(b)))
  def lshBuckets(emb: Column, nBits: Int, nTables: Int, seed: Long): Column =
    mk(LshBuckets(ex(emb), nBits, nTables, seed))
  def signDots(emb: Column, nCentroids: Int, seed: Long): Column =
    mk(SignDots(ex(emb), nCentroids, seed))
}
