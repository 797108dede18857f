// The Column <-> Expression converters (`classic.ExpressionUtils`) are
// `private[sql]` in Spark 4; this one-file bridge re-exports the two
// functions the engine needs for its native Catalyst expressions.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native expression on a live session's function registry
    * (what `SparkSessionExtensions.injectFunction` does at build time).
    */
  def registerFunction(spark: SparkSession, ident: FunctionIdentifier,
                       info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
