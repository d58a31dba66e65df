package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion `private[sql]`
  * (ExpressionUtils in columnNodeSupport.scala). This bridge — placed in the
  * sql package like every third-party Catalyst extension does — re-exports
  * just the two conversions the graft expressions need.
  */
object bridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
