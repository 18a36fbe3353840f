package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 decoupled `Column` from catalyst `Expression`; the official
  * bridge (`classic.ExpressionUtils`) is private[sql], so extensions
  * that add native expressions reach it through a same-package shim —
  * the standard technique used by Spark connector/extension libraries.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
