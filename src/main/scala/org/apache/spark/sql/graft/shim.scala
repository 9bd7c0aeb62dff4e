package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's classic backend: Column <-> catalyst Expression.
  * Spark 4 made Column wrap a ColumnNode; ExpressionUtils is the
  * sanctioned conversion for classic-session extensions (the
  * SparkSessionExtensions function-injection path uses the same shape). */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
