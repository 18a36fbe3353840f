package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-inventory guards: every declared query must analyze+plan, and
  * no plan may contain an accidental cartesian product (broadcast
  * nested-loop against a tiny/single-row side is fine and intended for
  * the band join and query-vector cross joins; an unkeyed
  * CartesianProduct is always a bug at scale). */
class AllQueriesSpec extends AnyFunSuite with LocalSparkSuite {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans without cartesian products") {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"unexpected CartesianProduct in $name:\n$plan")
    }
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
