package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4.x wraps columns in `ColumnNode`s; the classic converters live in
  * `org.apache.spark.sql.classic` with `private[sql]` visibility, so this tiny
  * shim (inside the `org.apache.spark.sql` package tree, the standard pattern
  * for Spark extension libraries) re-exports just the two conversions the
  * graft engine needs to expose custom Catalyst expressions as `Column`s.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
