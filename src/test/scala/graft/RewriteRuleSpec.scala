package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._
import graft.plans.RewriteDotProduct

/** The optimizer-rule showcase: the declarative HOF dot-product idiom
  * is rewritten to the codegen'd expression with identical results. */
class RewriteRuleSpec extends AnyFunSuite with LocalSparkSuite {

  test("RewriteDotProduct fires on the HOF idiom and preserves values") {
    spark.experimental.extraOptimizations = Seq(RewriteDotProduct)
    try {
      val df = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), dotd(col("embedding"), col("embedding")).as("d"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_dot"), s"rule did not fire:\n$optimized")
      // same values as the direct expression
      val viaRule = df.orderBy("vec_id").collect().map(_.getDouble(1))
      val direct = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), dotFast(col("embedding"), col("embedding")).as("d"))
        .orderBy("vec_id").collect().map(_.getDouble(1))
      assert(viaRule.sameElements(direct))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("GraftRewriteExtensions injects exactly the rewrite rule") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftRewriteExtensions().apply(exts)
    val rules = org.apache.spark.sql.GraftShims.optimizerRules(exts, spark)
    assert(rules == Seq(RewriteDotProduct))
    // and the function-registration class injects none
    val fexts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(fexts)
    assert(org.apache.spark.sql.GraftShims.optimizerRules(fexts, spark).isEmpty)
  }

  test("rule leaves non-matching aggregates alone") {
    spark.experimental.extraOptimizations = Seq(RewriteDotProduct)
    try {
      val df = Tables.embeddings(spark, sfDir)
        .select(aggregate(col("embedding").cast("array<double>"),
          lit(1.0), (acc, v) => acc * v).as("prod")) // product, not dot
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      df.head() // still executes
    } finally spark.experimental.extraOptimizations = Nil
  }
}
