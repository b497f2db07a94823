package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between `Column` and catalyst `Expression` for custom
  * expressions. Spark 4 hides the Column(expr) constructor behind the
  * ColumnNode abstraction; the supported hook (`classic.ExpressionUtils`)
  * is `private[sql]`, so this one-file subpackage of org.apache.spark.sql
  * re-exports it — the standard pattern for Catalyst extension libraries.
  */
object GraftColumns {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
