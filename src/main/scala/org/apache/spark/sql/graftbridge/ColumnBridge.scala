package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Expression bridge. `ExpressionUtils` is `private[sql]`, so
 * this one-file shim lives under `org.apache.spark.sql` to re-export
 * the two conversions graft's broadcast-backed centroid columns need
 * (`graft.operators.Ann.nearestCentroidBc` and friends build Columns
 * around expressions that carry a Broadcast handle — there is no
 * public constructor for that; the SQL-function registry only admits
 * literal arguments).
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
