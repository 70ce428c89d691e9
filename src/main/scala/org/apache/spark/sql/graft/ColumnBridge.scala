package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between our custom Catalyst expressions and the public Column
  * API. Spark 4 routes Column through ColumnNode and keeps the
  * Expression⇄Column converters `private[sql]`, so a library that ships a
  * native `Expression` needs this one-file shim inside the sql package —
  * the same pattern public Spark-extension libraries use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
