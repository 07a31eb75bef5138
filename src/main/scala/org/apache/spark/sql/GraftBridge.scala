package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. `classic.ExpressionUtils` is
  * `private[sql]` in Spark 4, so extension libraries reach it from a
  * shim inside the `org.apache.spark.sql` package — the standard
  * pattern for third-party native expressions. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
