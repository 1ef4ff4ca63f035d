package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 hides the classic Column↔Expression converters behind
  * `private[sql]`; libraries that ship native Catalyst expressions (the
  * codegen'd kernels in `graft.functions`) conventionally expose them via
  * a small shim compiled inside the `org.apache.spark.sql` package tree.
  * Keep this file tiny — everything else lives under `graft.*`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on an EXISTING session (the
    * `sessionState` accessor is `private[sql]` too). Lets applications
    * adopt the graft SQL functions without rebuilding their session
    * with `spark.sql.extensions`.
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
