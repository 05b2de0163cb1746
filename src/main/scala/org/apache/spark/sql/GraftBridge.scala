package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface for building Columns from custom
  * Catalyst expressions (the classic-mode ColumnNode wrapper). Standard
  * extension-library pattern — the alternative (registering a temp SQL
  * function per call site) can't carry non-child constructor state such as
  * bloom-filter bits.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
