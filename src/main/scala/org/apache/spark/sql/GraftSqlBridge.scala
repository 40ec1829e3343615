package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor for `private[sql]` Column↔Expression plumbing (Spark 4 moved Column onto
  * ColumnNode; `classic.ExpressionUtils` is the sanctioned internal bridge). Lives in the
  * org.apache.spark.sql package purely for visibility — no Spark code is modified.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
