/* Column ↔ Catalyst Expression bridge. ExpressionUtils is private[sql], so
 * this one file lives in the org.apache.spark.sql package namespace; the
 * rest of the engine goes through this object and never touches Spark
 * internals directly. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object GraftBridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
