package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4
  * moved Column onto ColumnNode; ExpressionUtils is the sanctioned
  * internal path). Lives under org.apache.spark.sql so the package-
  * private members resolve — the one place graft reaches into Spark
  * internals for plumbing rather than semantics.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
