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

  /** Test-only visibility shim: materialize the optimizer rules an
    * extensions class injected, so specs can assert the
    * spark.sql.extensions wiring without building a second session. */
  def optimizerRules(e: SparkSessionExtensions, s: SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    e.buildOptimizerRules(s)
}
