package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column.expr` / `new Column(expr)` private[sql]; this
  * shim (compiled into the sql package namespace, the standard pattern
  * for extension libraries) re-exports the two conversions the graft
  * native functions need. No Spark internals are modified.
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
