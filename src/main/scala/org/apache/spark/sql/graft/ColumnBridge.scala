package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the converters (`classic.ExpressionUtils`) private[sql],
  * so libraries that define custom expressions need one file inside the
  * `org.apache.spark.sql` namespace — the standard extension shim
  * pattern. Everything else in graft stays in the `graft.*` packages.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
