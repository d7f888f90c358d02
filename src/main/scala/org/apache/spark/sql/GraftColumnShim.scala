package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Visibility shim: the classic Column⇄Expression bridge is
  * private[sql] in Spark 4; graft's native expressions need it to
  * surface as user-facing Columns.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
