package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made `Column` API-agnostic (it wraps a ColumnNode, not an
  * Expression) and gated the classic converters `private[sql]`; this
  * one-file shim in the sql package re-exports exactly the two
  * conversions a library needs to expose native expressions as Columns.
  */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
