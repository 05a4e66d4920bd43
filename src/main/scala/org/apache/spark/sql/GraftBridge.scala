package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression converters — the
  * standard technique third-party Spark packages use to expose native
  * Catalyst expressions as user-facing Columns on Spark 4.x (where Column
  * wraps a ColumnNode rather than an Expression).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
