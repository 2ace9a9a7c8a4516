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
}
