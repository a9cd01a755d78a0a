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

  /** Eager session-bound Column→Expression conversion. The plain
    * `expression(c)` wraps the column node lazily (ColumnNodeExpression)
    * and relies on Dataset API entry points to convert it — a custom
    * logical node never passes through those, so its expressions would
    * carry non-serializable internal nodes into task closures.
    */
  def expressionEager(spark: org.apache.spark.sql.SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  /** DataFrame from a (possibly custom) logical plan. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
