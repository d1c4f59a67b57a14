package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's unified Column API hides the catalyst Expression constructor
  * behind `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils).
  * This bridge lives inside the org.apache.spark.sql package tree to expose
  * the two conversions graft's custom expressions need — the same technique
  * every Catalyst-extension library uses.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
