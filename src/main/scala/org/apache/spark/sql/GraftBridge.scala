package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` surface: wrap a raw Catalyst
  * Expression as a user-facing Column (and back). Spark 4 removed the
  * public `new Column(expr)` constructor; `classic.ExpressionUtils` is the
  * supported internal path and this shim is the single place we touch it.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
