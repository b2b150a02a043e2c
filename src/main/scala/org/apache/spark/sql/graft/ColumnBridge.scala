package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column <-> Expression conversions live behind private[sql]
  * (`org.apache.spark.sql.classic.ExpressionUtils`, columnNodeSupport.scala
  * in the Spark source). This bridge re-exports them for graft's custom
  * Catalyst expressions; it contains no logic of its own.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
