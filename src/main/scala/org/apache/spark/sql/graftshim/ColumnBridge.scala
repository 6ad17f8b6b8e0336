package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnConversions, ExpressionColumnNode}

/** Compile-time bridge into Spark's `private[sql]` Column internals.
  *
  * Spark 4 `Column` wraps a `ColumnNode`; the classic converters that map
  * to/from Catalyst `Expression` are `private[sql]`. This one-file shim
  * lives in the `org.apache.spark.sql` package purely to re-export those
  * two conversions to the engine (a standard pattern for Spark-native
  * libraries adding custom expressions). No Spark behavior is modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ColumnConversions.expression(c)
}
