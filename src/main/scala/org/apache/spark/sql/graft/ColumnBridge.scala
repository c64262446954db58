package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed public Column(expr)/Column.expr; the supported bridge
  * (ExpressionUtils) is private[sql]. This shim — placed in the sql
  * namespace like every Spark extension library does — re-exports the two
  * conversions our custom Catalyst expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
