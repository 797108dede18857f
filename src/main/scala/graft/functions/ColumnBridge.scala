// The Column <-> Expression converters (`classic.ExpressionUtils`) are
// `private[sql]` in Spark 4; this one-file bridge re-exports the two
// functions the engine needs for its native Catalyst expressions.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
