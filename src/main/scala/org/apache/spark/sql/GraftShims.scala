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

  /** Wrap a custom LogicalPlan as a DataFrame (the constructor every
    * extension with its own logical operators needs; `Dataset.ofRows`
    * is private[sql]). */
  def dataFrame(s: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  /** The logical plan behind a DataFrame (same bridge, other
    * direction). */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan

  /** Column → catalyst Expression via the session converter (plain
    * UnresolvedAttribute / SortOrder trees the analyzer resolves inside
    * CUSTOM logical nodes). `expression(c)` above wraps the column node
    * lazily, which only resolves on the built-in Dataset API paths —
    * fine for scalar-function bridging, wrong for plan construction. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** The session's `spark.sql.autoBroadcastJoinThreshold` as bytes
    * (SQLConf is private[sql]; operators that make their own
    * broadcast-vs-shuffle call — q103's adaptive exact phase — must
    * obey the same knob the planner does, not a parallel constant). */
  def autoBroadcastThreshold(s: SparkSession): Long =
    s.asInstanceOf[classic.SparkSession].sessionState.conf.autoBroadcastJoinThreshold

  /** Test-only visibility shim: materialize the optimizer rules an
    * extensions class injected, so specs can assert the
    * spark.sql.extensions wiring without building a second session. */
  def optimizerRules(e: SparkSessionExtensions, s: SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    e.buildOptimizerRules(s)

  /** Same shim for injected planner strategies. */
  def plannerStrategies(e: SparkSessionExtensions, s: SparkSession)
      : Seq[org.apache.spark.sql.execution.SparkStrategy] =
    e.buildPlannerStrategies(s)
}
