package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for the engine's native expressions.
  * Spark 4 scopes `classic.ExpressionUtils` private[sql], so the one
  * legitimate consumer an engine has — building a Column from its own
  * Catalyst expression without a per-session function registry — needs
  * this thin accessor inside the sql package. No behavior, no state:
  * two delegating calls.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
