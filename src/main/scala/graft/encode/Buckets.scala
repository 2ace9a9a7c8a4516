package graft.encode

import org.apache.spark.sql.GraftBridge
import org.apache.spark.unsafe.types.UTF8String

/** Scala replica of EncodeJob.withBucket's SQL bucket expression —
  * BIT-IDENTICAL by construction, and pinned by BucketSpec against the SQL
  * path on real data:
  *
  *   salt     = pmod(xxhash64(doc_id), saltBuckets)
  *   lenClass = floor(log2(greatest(double(n_tok), 1.0)))       // BIGINT
  *   bucket   = pmod(xxhash64(source, lenClass, salt), numBuckets)
  *
  * xxhash64 goes through Spark's own XXH64 (same class codegen calls);
  * log2 is StrictMath.log(x)/StrictMath.log(2.0) exactly as Spark's Log2
  * emits (floating-point identical — StrictMath is platform-exact);
  * floor(double→long) is Math.floor(...).toLong as Spark's Floor emits.
  *
  * Bit-exactness is a RESUME invariant, not a nicety: ResumableEncode
  * filters uncommitted rows via the SQL expression while the columnar pack
  * assigns buckets via this function — a single diverging row would land
  * in a wrong bucket and break exact manifest resume.
  */
object Buckets {
  @inline private def pmod(a: Long, n: Long): Long = {
    val r = a % n
    if (r < 0) (r + n) % n else r
  }

  private val Seed = 42L

  def of(docId: UTF8String, nTok: Int, source: UTF8String,
         numBuckets: Int, saltBuckets: Int): Int = {
    val salt = pmod(GraftBridge.xxhashUtf8(docId, Seed), saltBuckets.toLong)
    val lenClass = Math.floor(
      StrictMath.log(Math.max(nTok.toDouble, 1.0)) / StrictMath.log(2.0)).toLong
    var h = Seed
    h = GraftBridge.xxhashUtf8(source, h)
    h = GraftBridge.xxhashLong(lenClass, h)
    h = GraftBridge.xxhashLong(salt, h)
    pmod(h, numBuckets.toLong).toInt
  }
}
