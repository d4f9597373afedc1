package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Spark 4 backs `Column` with `ColumnNode`s; the Expression<->Column
 * converters live in `org.apache.spark.sql.classic.ExpressionUtils`, which is
 * `private[sql]`. This bridge (placed inside the org.apache.spark.sql package
 * namespace) re-exports the two conversions our Catalyst-expression DSL needs.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
