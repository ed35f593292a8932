package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between graft's Catalyst expressions and the public Column API.
 * Spark 4.x moved `new Column(expr)` behind `private[sql]`; extension
 * libraries conventionally shim it from the org.apache.spark.sql namespace.
 */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
