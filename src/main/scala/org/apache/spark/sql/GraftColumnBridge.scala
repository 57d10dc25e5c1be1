package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 moved `Column` to a backend-agnostic ColumnNode representation
  * and made the Expression constructors `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Libraries that ship
  * their own expressions use a bridge object inside the
  * `org.apache.spark.sql` package to reach them — the same pattern Spark
  * extension projects (Delta, Sedona, ...) use. This is the ONLY file in
  * the repo outside the `graft` namespace, and it contains no logic.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a SQL function on an EXISTING session (the
    * SparkSessionExtensions path only runs at session construction).
    * `sessionState` is `private[sql]`, hence bridged here.
    */
  def registerFunction(
      spark: SparkSession,
      fn: (
          org.apache.spark.sql.catalyst.FunctionIdentifier,
          org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
          Seq[Expression] => Expression,
      ),
  ): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(fn._1, fn._2, fn._3)
}
