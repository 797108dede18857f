// The Column <-> Expression converters (`classic.ExpressionUtils`) are
// `private[sql]` in Spark 4; this one-file bridge re-exports the two
// functions the engine needs for its native Catalyst expressions.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.SparkStrategy

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an already-resolved logical plan (e.g. a custom operator node) in
    * a DataFrame — `Dataset.ofRows` is `private[sql]` in Spark 4.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark), plan)

  /** Idempotently add a planner strategy to a live session (the build-time
    * equivalent is `SparkSessionExtensions.injectPlannerStrategy`).
    */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark).experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = strategy +: exp.extraStrategies
  }

  /** Register a native expression on a live session's function registry
    * (what `SparkSessionExtensions.injectFunction` does at build time).
    */
  def registerFunction(spark: SparkSession, ident: FunctionIdentifier,
                       info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .sessionState.functionRegistry.registerFunction(ident, info, builder)

  /** Register a table-valued function on a live session (what
    * `SparkSessionExtensions.injectTableFunction` does at build time).
    */
  def registerTableFunction(spark: SparkSession, ident: FunctionIdentifier,
                            info: ExpressionInfo,
                            builder: Seq[Expression] => LogicalPlan): Unit =
    org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .sessionState.tableFunctionRegistry.registerFunction(ident, info, builder)

}
