package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow accessor for Spark's `private[sql]` Column↔Expression bridge.
  * Spark 4 wraps Column around ColumnNode; converting a custom Catalyst
  * expression (e.g. our DeclarativeAggregate) into a user-facing Column
  * goes through ExpressionUtils, which is sql-package-private — this is
  * the one sanctioned-shape shim the engine needs. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
