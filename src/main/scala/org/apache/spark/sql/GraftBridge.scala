package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's private[sql] Column↔Expression converters (the
  * classic/Connect split hid the old `Column(expr)` constructor). Lives in
  * the org.apache.spark.sql package purely for access; no Spark internals are
  * modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** Physical InternalRow RDD of a DataFrame (rows are reused — copy what
    * you keep). Used by the encode hot path to skip the object Encoder.
    */
  def toInternalRdd(df: DataFrame): org.apache.spark.rdd.RDD[catalyst.InternalRow] =
    classic.ClassicConversions.castToImpl(df).queryExecution.toRdd

  /** When `df` plans to a BARE columnar file scan (no project/filter beyond
    * the WholeStageCodegen/ColumnarToRow wrappers), return the scan's
    * ColumnarBatch RDD + its output column names. The encode map side then
    * packs STRAIGHT from the parquet column vectors, skipping
    * ColumnarToRow's per-row UnsafeRow materialization (~8 B/token of
    * memory traffic). Any derived input (projections, joins, tokenization)
    * returns None and takes the row path.
    */
  def columnarScan(df: DataFrame): Option[(org.apache.spark.rdd.RDD[vectorized.ColumnarBatch], Seq[String])] = {
    val plan = classic.ClassicConversions.castToImpl(df).queryExecution.executedPlan
    @scala.annotation.tailrec
    def unwrap(p: execution.SparkPlan): execution.SparkPlan = p match {
      case w: execution.WholeStageCodegenExec => unwrap(w.child)
      case i: execution.InputAdapter => unwrap(i.child)
      case c: execution.ColumnarToRowExec => unwrap(c.child)
      case other => other
    }
    unwrap(plan) match {
      case s if s.supportsColumnar => Some((s.executeColumnar(), s.output.map(_.name)))
      case _ => None
    }
  }

  /** DataFrame over an InternalRow RDD without a row Encoder — the decode
    * hot path's output side: decoded rows are emitted as InternalRows
    * (UTF8String + UnsafeArrayData) and enter the plan through one
    * UnsafeProjection in RDDScanExec, instead of per-row case-class
    * construction + Dataset-encoder serialization (two extra copies of
    * every token, the round-3 bench's dominant query cost).
    */
  def internalCreateDataFrame(spark: SparkSession,
                              rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
                              schema: types.StructType): DataFrame =
    classic.ClassicConversions.castToImpl(spark)
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** Bit-exact Spark xxhash64 primitives (the bucket function must evaluate
    * identically through the SQL path and the columnar pack path).
    */
  def xxhashUtf8(s: org.apache.spark.unsafe.types.UTF8String, seed: Long): Long =
    catalyst.expressions.XXH64.hashUTF8String(s, seed)
  def xxhashLong(v: Long, seed: Long): Long =
    catalyst.expressions.XXH64.hashLong(v, seed)
}
