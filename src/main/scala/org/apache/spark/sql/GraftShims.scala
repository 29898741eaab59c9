package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression converters, for graft's
  * custom Catalyst expressions. Lives in the spark.sql package solely to
  * cross the access boundary — the standard pattern for third-party
  * Catalyst extensions that predate a public conversion API. */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
