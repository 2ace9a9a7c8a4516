package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-column compression: symmetric per-vector int8 scalar
  * quantization — the engine's per-column lightweight-compression family
  * (dict/RLE/FSST/bit-pack/FoR over token columns) extended to the other
  * big column of a training corpus, `embedding: array<float>`.
  *
  * Codes: scale = max(|x_i|)/127 (double), q_i = round-half-away-from-zero
  * (x_i/scale) ∈ [-127,127], stored as ONE BYTE per dimension (BinaryType) —
  * a 4× scan-byte reduction vs float32 with a per-element reconstruction
  * error ≤ scale/2. Cosine is scale-invariant, so similarity search runs
  * DIRECTLY on the codes with integer dot products (SIMD-friendly, no
  * dequantize in the hot loop); a float query composes via dequantize_i8
  * (asymmetric/ADC scoring). Every op is a deterministic function of the
  * input doubles, so a SQL oracle reproduces the exact code values —
  * correctness is hash-checked, not eyeballed.
  *
  * At 100 TB: quantization is embarrassingly parallel (one pass per row, no
  * shuffle); the quantized table is what ships to the ANN index builders
  * (IVF cells over codes — see Similarity), cutting both storage and the
  * memory bandwidth that bounds brute-force scoring by 4×.
  */
object QuantizeKernel {
  /** max(|x_i|)/127 in double — float→double widening is exact, so the
    * scale is a deterministic function of the stored bits.
    */
  def scaleOf(emb: Array[Float]): Double = {
    var maxabs = 0.0
    var i = 0
    while (i < emb.length) {
      val a = math.abs(emb(i).toDouble)
      if (a > maxabs) maxabs = a
      i += 1
    }
    maxabs / 127.0
  }

  /** Round-half-away-from-zero of x/scale — spelled as floor(|x|/s + 0.5)
    * with the sign reapplied so the SQL oracle can reproduce it verbatim
    * (DuckDB round() has the same semantics, but writing the floor form on
    * both sides removes any engine-rounding ambiguity). |q| ≤ 127 + ulp
    * noise < 127.5, so the floor always fits a byte.
    */
  @inline def code(x: Double, scale: Double): Int =
    if (scale == 0.0) 0
    else if (x >= 0) math.floor(x / scale + 0.5).toInt
    else -math.floor(-x / scale + 0.5).toInt

  def quantize(emb: Array[Float], scale: Double): Array[Byte] = {
    val out = new Array[Byte](emb.length)
    var i = 0
    while (i < emb.length) {
      out(i) = code(emb(i).toDouble, scale).toByte
      i += 1
    }
    out
  }
}

/** i8_scale(emb): the per-vector quantization scale max(|x|)/127. */
case class I8Scale(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "i8_scale"
  override protected def nullSafeEval(v: Any): Any =
    QuantizeKernel.scaleOf(v.asInstanceOf[ArrayData].toFloatArray())
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** quantize_i8(emb): int8 codes packed one byte per dimension (the
  * compressed storage form — 1 B/dim vs float32's 4).
  */
case class QuantizeI8(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "quantize_i8"
  override protected def nullSafeEval(v: Any): Any = {
    val emb = v.asInstanceOf[ArrayData].toFloatArray()
    QuantizeKernel.quantize(emb, QuantizeKernel.scaleOf(emb))
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** i8_codes(codes): the packed bytes widened to array<int> — the bridge to
  * Spark's built-in higher-order functions (aggregate/array_min/array_max)
  * for code-level analytics.
  */
case class I8Codes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "i8_codes"
  override protected def nullSafeEval(v: Any): Any = {
    val q = v.asInstanceOf[Array[Byte]]
    val out = new Array[Int](q.length)
    var i = 0
    while (i < q.length) { out(i) = q(i).toInt; i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** dequantize_i8(codes, scale): approximate reconstruction q_i·scale as
  * array<float> — the asymmetric (ADC) path: a float query scores against
  * dequantized table vectors without the table ever storing floats.
  */
case class DequantizeI8(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "dequantize_i8"
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val q = l.asInstanceOf[Array[Byte]]
    val s = r.asInstanceOf[Double]
    val out = new Array[Float](q.length)
    var i = 0
    while (i < q.length) { out(i) = (q(i) * s).toFloat; i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** dot_i8(a, b): integer dot product of two code vectors — EXACT (≤ 64·127²
  * per lane, nowhere near overflow), so downstream checks hash on integers,
  * not floats.
  */
case class DotI8(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i8"
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    var dot = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i).toLong * b(i).toLong; i += 1 }
    java.lang.Long.valueOf(dot)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cosine_sim_i8(a, b): cosine over int8 codes. Cosine is scale-invariant,
  * so this approximates the float cosine with NO dequantization — three
  * integer accumulators per pair, then one sqrt+division in double (exact
  * integer inputs ⇒ the double result is reproducible cross-engine).
  */
case class CosineSimI8(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_i8"
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toLong
      val y = b(i).toLong
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** i8_recon_ok(emb): attests the quantization error bound on this vector —
  * every |x_i − q_i·scale| ≤ scale/2 (+1e-12 for the two float roundings).
  * Computed from the embedding alone with the same double-op sequence the
  * SQL oracle spells out, so the booleans hash-match across engines.
  */
case class I8ReconOk(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "i8_recon_ok"
  override protected def nullSafeEval(v: Any): Any = {
    val emb = v.asInstanceOf[ArrayData].toFloatArray()
    val s = QuantizeKernel.scaleOf(emb)
    var ok = true
    var i = 0
    while (i < emb.length && ok) {
      val x = emb(i).toDouble
      ok = math.abs(x - QuantizeKernel.code(x, s) * s) <= s * 0.5 + 1e-12
      i += 1
    }
    java.lang.Boolean.valueOf(ok)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object Quantize {
  import GraftBridge.{column => mk, expression => ex}

  def i8Scale(emb: Column): Column = mk(I8Scale(ex(emb)))
  def quantizeI8(emb: Column): Column = mk(QuantizeI8(ex(emb)))
  def i8Codes(codes: Column): Column = mk(I8Codes(ex(codes)))
  def dequantizeI8(codes: Column, scale: Column): Column =
    mk(DequantizeI8(ex(codes), ex(scale)))
  def dotI8(a: Column, b: Column): Column = mk(DotI8(ex(a), ex(b)))
  def cosineSimI8(a: Column, b: Column): Column = mk(CosineSimI8(ex(a), ex(b)))
  def i8ReconOk(emb: Column): Column = mk(I8ReconOk(ex(emb)))

  /** The quantized embedding table — what a 100-TB pipeline stores instead
    * of float32: (vec_id, q: 1 B/dim codes, scale: 8 B). One narrow pass,
    * no shuffle; columnar parquet keeps q as a single binary column.
    */
  def quantizeTable(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      quantizeI8(col("embedding")).as("q"),
      i8Scale(col("embedding")).as("scale"))

  /** Per-vector code-level stats + the reconstruction-bound attestation —
    * exact integers end to end (the correctness surface for the codec).
    */
  def quantizeStats(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        i8Codes(quantizeI8(col("embedding"))).as("__q"),
        i8ReconOk(col("embedding")).as("recon_ok"))
      .select(col("vec_id"),
        size(col("__q")).cast("long").as("n_bytes"),
        expr("aggregate(__q, 0L, (a, x) -> a + x)").as("q_sum"),
        array_min(col("__q")).cast("long").as("q_min"),
        array_max(col("__q")).cast("long").as("q_max"),
        col("recon_ok"))

  /** IVF-SQ8: the production ANN layout — the cell-partitioned on-disk
    * inverted-file index (Similarity.ivfSignIndexWrite's 100-TB shape) with
    * the payload stored as int8 CODES instead of float32. A query prunes to
    * nprobe/nlist of the files at listing time AND the surviving scan moves
    * 4× fewer bytes, scored with integer dots. Same sign-vector coarse
    * quantizer as q_ann_ivf, so the SQL oracle covers cell assignment,
    * probe selection, and the quantized ranking end to end.
    */
  def ivfSq8IndexWrite(emb: DataFrame, path: String, nlist: Int = 16,
                       seed: Long = 13L): Unit = {
    val withDots = emb.withColumn("__dots",
      PipelineFunctions.signDots(col("embedding"), nlist, seed))
    withDots.withColumn("__cell",
        (array_position(col("__dots"), array_max(col("__dots"))) - 1).cast("int"))
      .select(col("vec_id"),
        quantizeI8(col("embedding")).as("q"),
        i8Scale(col("embedding")).as("scale"),
        col("__cell"))
      // hash write-distribution on the partition column — same rationale as
      // Similarity.ivfSignIndexWrite (guide §6): parallel one-file-per-cell
      // writers instead of a serial per-task dynamic-partition file chain
      .repartition(nlist * 2, col("__cell"))
      .write.partitionBy("__cell").mode("overwrite").parquet(path)
  }

  /** Query the SQ8 index: probe cells computed DRIVER-SIDE (literal IN over
    * the partition column → file-listing-time pruning), the query vector
    * quantized once on the driver and shipped as a binary literal; scoring
    * is cosine over codes. Emits the exact integer dot/norm triple.
    */
  def ivfSq8Query(spark: org.apache.spark.sql.SparkSession, path: String,
                  queryEmb: Array[Float], k: Int, nlist: Int = 16,
                  nprobe: Int = 4, seed: Long = 13L,
                  excludeVecId: Long = -1L): DataFrame = {
    val probe = Similarity.signProbeCells(queryEmb, nlist, nprobe, seed)
    val qCodes = QuantizeKernel.quantize(queryEmb, QuantizeKernel.scaleOf(queryEmb))
    val qLit = lit(qCodes)
    spark.read.parquet(path)
      .filter(col("__cell").isin(probe.map(Integer.valueOf): _*) &&
        col("vec_id") =!= excludeVecId)
      .select(col("vec_id"),
        dotI8(col("q"), qLit).as("dot_qq"),
        dotI8(qLit, qLit).as("norm_a"),
        dotI8(col("q"), col("q")).as("norm_b"),
        cosineSimI8(col("q"), qLit).as("__cos"))
      .orderBy(desc("__cos"), col("vec_id"))
      .select(col("vec_id"), col("dot_qq"), col("norm_a"), col("norm_b"))
      .limit(k)
  }

  /** Brute-force top-k IN THE QUANTIZED DOMAIN: the query vector is
    * quantized once and broadcast; every candidate is scored with integer
    * dot products over 1-byte codes — a 4× memory-traffic cut on the scan
    * that bounds brute-force ANN. Emits the exact integer dot/norms so the
    * result hashes deterministically.
    */
  def bruteForceTopKQuantized(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = emb.select(col("vec_id"), quantizeI8(col("embedding")).as("qc"))
    val qv = broadcast(q.filter(col("vec_id") === queryId)
      .select(col("qc").as("q_query")))
    q.filter(col("vec_id") =!= queryId)
      .crossJoin(qv)
      .select(col("vec_id"),
        dotI8(col("qc"), col("q_query")).as("dot_qq"),
        dotI8(col("q_query"), col("q_query")).as("norm_a"),
        dotI8(col("qc"), col("qc")).as("norm_b"),
        cosineSimI8(col("qc"), col("q_query")).as("__cos"))
      .orderBy(desc("__cos"), col("vec_id"))
      .select(col("vec_id"), col("dot_qq"), col("norm_a"), col("norm_b"))
      .limit(k)
  }
}
