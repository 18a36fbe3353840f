package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.dotFast
import graft.plans.{TopKPerKey, TopKPerKeyExec, TopKPerKeyStrategy}

/** Grades the §4(c) custom-operator stack (logical node → strategy →
  * heap-based physical operator): value-identity to the window
  * formulation it replaces, the plan shape it exists for (exchange on
  * the key, NO sort), partitioning invariance, and the
  * SparkSessionExtensions wiring. */
class TopKPerKeySpec extends AnyFunSuite with LocalSparkSuite {

  private implicit def session: org.apache.spark.sql.SparkSession = spark

  private def energies = Tables.embeddings(spark, sfDir)
    .select(col("label"), col("vec_id"),
      dotFast(col("embedding"), col("embedding")).as("energy"))

  private def viaWindow(k: Int) = energies
    .withColumn("rn", row_number().over(
      Window.partitionBy(col("label")).orderBy(col("energy").desc, col("vec_id"))))
    .filter(col("rn") <= k).drop("rn")

  test("matches the row_number window formulation row for row") {
    val w = viaWindow(5).orderBy(col("label"), col("vec_id")).collect()
    val t = TopKPerKey.topKPerKey(energies,
        Seq(col("label")), Seq(col("energy").desc, col("vec_id").asc), 5)
      .orderBy(col("label"), col("vec_id")).collect()
    assert(t.toSeq === w.toSeq)
  }

  test("plans to TopKPerKeyExec with a key exchange and NO sort") {
    val df = TopKPerKey.topKPerKey(energies,
      Seq(col("label")), Seq(col("energy").desc, col("vec_id").asc), 3)
    // collect() can't see through AdaptiveSparkPlanExec pre-execution,
    // so assert on the rendered plan (which includes the inner tree)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["), s"no TopKPerKeyExec in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(label"),
      "key exchange missing — ClusteredDistribution not enforced")
    assert(!plan.contains("Sort "),
      s"a sort crept into the heap operator's plan:\n$plan")
    df.count() // execute once so the finalized AQE plan ran the operator
    val finalPlan = df.queryExecution.executedPlan
    val execs = finalPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case e: TopKPerKeyExec => e }
      case p => p.collect { case e: TopKPerKeyExec => e }
    }
    assert(execs.nonEmpty, s"finalized plan lost the operator:\n$finalPlan")
  }

  test("result is invariant to input partitioning (heaps merge per key)") {
    val base = TopKPerKey.topKPerKey(energies,
        Seq(col("label")), Seq(col("energy").desc, col("vec_id").asc), 4)
      .orderBy(col("label"), col("vec_id")).collect()
    val shuffled = TopKPerKey.topKPerKey(
        energies.repartition(13, col("vec_id")),
        Seq(col("label")), Seq(col("energy").desc, col("vec_id").asc), 4)
      .orderBy(col("label"), col("vec_id")).collect()
    assert(base.toSeq === shuffled.toSeq)
  }

  test("k larger than every group degrades to identity") {
    val all = TopKPerKey.topKPerKey(energies,
        Seq(col("label")), Seq(col("energy").desc, col("vec_id").asc), 1000000)
      .count()
    assert(all === energies.count())
  }

  test("GraftExtensions injects the strategy") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    val strategies = org.apache.spark.sql.GraftShims.plannerStrategies(ext, spark)
    assert(strategies.contains(TopKPerKeyStrategy))
  }
}
