package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's Column ⇄ Expression converters, which moved behind
  * private[sql] in Spark 4's Column-node refactor. Living under the
  * org.apache.spark.sql package tree is the standard pattern for libraries
  * that ship custom Catalyst expressions with a Column API. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
