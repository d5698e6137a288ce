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

  /** Strip a `.asc`/`.desc` sort wrapper, returning the VALUE column —
    * Spark 4 models sort direction as an internal SortOrder ColumnNode, so
    * a caller holding ordering columns cannot otherwise hash/project them. */
  def stripSortOrder(c: Column): Column = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder => Column(so.child)
    case _ => c
  }
}
