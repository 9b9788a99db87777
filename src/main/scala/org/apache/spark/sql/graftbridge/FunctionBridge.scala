package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge into the `private[sql]` session function registry, so graft's
  * native expressions can be registered as SQL functions on an ALREADY
  * RUNNING session (the `spark.sql.extensions=graft.functions.
  * GraftExtensions` conf covers new sessions; this covers notebooks and
  * shared test sessions that exist before the library loads).
  */
object FunctionBridge {
  def register(
      spark: SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
