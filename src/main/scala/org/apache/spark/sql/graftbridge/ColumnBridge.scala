package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge.
  *
  * Spark 4 made `Column` connect-agnostic; the classic bridge
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is `private[sql]`, so
  * libraries that ship native Catalyst expressions host this one-liner
  * inside the `org.apache.spark.sql` namespace — the standard extension
  * seam used by Spark connector/extension projects.
  */
object ColumnBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
