package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge between the public `Column` API and Catalyst
  * [[Expression]]s for this library's native expressions (graft.functions).
  *
  * Spark 4 routes `Column` through column nodes; the classic converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`, so
  * this one-file shim lives inside the `org.apache.spark.sql` package tree.
  * No Spark internals are modified — these are pure adapters.
  */
package object graftshim {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic/local mode). */
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
