package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access bridge into `private[sql]` Spark internals, the
  * conventional pattern for Spark extension libraries: Column <->
  * Expression conversion (so native expressions are usable from the
  * DataFrame API without session-level registration) and imperative
  * function-registry access (for sessions created without
  * `spark.sql.extensions`). Everything else in this repo stays in the
  * public API. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(spark: SparkSession, id: FunctionIdentifier,
                       info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
}
