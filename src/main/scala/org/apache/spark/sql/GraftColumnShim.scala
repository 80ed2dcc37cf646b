package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's native Catalyst expressions and the public
  * Column API. Spark 4 made Column construction from an Expression
  * `private[sql]` (`classic.ExpressionUtils`); this shim — the standard
  * technique third-party Spark extension libraries use — re-exports
  * exactly the two conversions graft needs. Living in the
  * org.apache.spark.sql package is what grants the access; nothing else
  * internal is touched, and no session-level function registration is
  * required (the expressions work in ANY session, including ones the
  * test driver creates itself).
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
