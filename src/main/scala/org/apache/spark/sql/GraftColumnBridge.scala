package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved Column off catalyst Expression (sql-api split); the
  * converter lives in `private[sql]` ExpressionUtils. This is the minimal
  * public bridge for graft's native expressions — nothing else reaches into
  * Spark internals.
  */
object GraftColumnBridge {
  def column(e: Expression): Column     = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
