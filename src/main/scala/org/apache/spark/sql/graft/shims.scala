package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column` and catalyst `Expression` — these
  * conversions are `private[sql]` in Spark 4, so third-party expression
  * libraries expose them via a shim inside the sql package namespace
  * (the same pattern used by spark-extension libraries in the ecosystem). */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
