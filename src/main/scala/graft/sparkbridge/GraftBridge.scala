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

  /** Stop the streaming state-store maintenance pool. Must run after the
    * last streaming query stops and BEFORE `spark.stop()`: the maintenance
    * thread otherwise outlives the session's RpcEnv and dies loudly with
    * RpcEnvStoppedException, polluting stdout (round-1 bench parse failure).
    */
  def stopStateStore(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
}
