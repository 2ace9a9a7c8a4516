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
}
