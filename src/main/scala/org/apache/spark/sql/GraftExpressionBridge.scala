package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and catalyst Expressions for
  * graft's custom expressions. Spark 4's Column wraps a ColumnNode (it is
  * implementation-agnostic); the classic-API converters that unwrap it are
  * `private[sql]`, so this one-file shim lives in the sql package — the
  * same technique third-party Spark extensions use.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
