package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made `ExpressionUtils`
  * private[sql], so libraries providing typed builders for custom
  * Catalyst expressions host this one-liner inside the sql package —
  * the standard extension-library pattern (same access rules Spark's
  * own connectors rely on). Everything else in graft stays on public
  * API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
