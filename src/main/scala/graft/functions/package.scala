package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Catalyst Expression bridge for Spark 4.x, where `Column` wraps
  * a `ColumnNode` and no longer exposes `.expr` publicly. */
package object functions {
  private[graft] def exprOf(c: Column): Expression =
    org.apache.spark.sql.graftshim.ColumnBridge.expression(c)

  private[graft] def columnOf(e: Expression): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(e)
}
