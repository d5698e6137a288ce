package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column off a public `expr`; the supported conversion lives
  * in `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * private[sql]. This bridge re-exports the two conversions for graft's
  * custom Catalyst expressions (same technique every Spark extension
  * library uses for private[sql] surfaces). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
