package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` helpers: build public [[Column]]s from catalyst
  * Expressions (Spark 4 removed the public `new Column(expr)` constructor).
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** [[org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes]] with the
  * expected types given as plain [[org.apache.spark.sql.types.DataType]]s —
  * `AbstractDataType` is `private[sql]`, so expressions living outside the
  * spark.sql package tree can't write the `inputTypes` signature directly.
  */
trait TypedInputs
    extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  def expectedInputTypes: Seq[org.apache.spark.sql.types.DataType]
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    expectedInputTypes
}
