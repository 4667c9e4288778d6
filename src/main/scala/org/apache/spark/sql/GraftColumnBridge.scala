package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a Catalyst `Expression` to a user-facing `Column` for
  * graft's native expressions (Spark 4 made the `Column(expr)`
  * constructor internal; `ExpressionUtils.column` is the sanctioned
  * classic-backend path, package-private to `org.apache.spark.sql`).
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
