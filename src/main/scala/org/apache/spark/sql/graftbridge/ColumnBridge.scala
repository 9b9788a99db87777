package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression conversions —
  * the sanctioned pattern for libraries shipping custom Catalyst
  * expressions on Spark 4 (Column no longer exposes a public
  * Expression constructor).
  */
object ColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
