package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge. Spark 4 made the constructor-side of
  * `Column` private[sql] (Column is a ColumnNode wrapper in sql-api);
  * third-party Catalyst expressions get lifted through this shim — the
  * same packaging technique community libraries use.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
