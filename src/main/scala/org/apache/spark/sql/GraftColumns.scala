package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-internal Column↔Expression converters, which are
  * `private[sql]` in Spark 4 (`classic.ExpressionUtils`). Needed to expose
  * custom Catalyst expressions (e.g. graft's SimHash64) as user-facing
  * `Column`s without going through a UDF. */
object GraftColumns {
  def ofExpr(e: Expression): Column = classic.ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
