package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column <-> catalyst Expression
  * converters (the Spark 4 sql-api split moved them behind
  * `classic.ExpressionUtils`). Lives in `org.apache.spark.sql` solely
  * to satisfy the access scope — the standard pattern for libraries
  * that build custom Catalyst expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
