package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-inventory guards: every declared query must analyze+plan, and
  * no plan may contain an accidental cartesian product (broadcast
  * nested-loop against a tiny/single-row side is fine and intended for
  * the band join and query-vector cross joins; an unkeyed
  * CartesianProduct is always a bug at scale). */
class AllQueriesSpec extends AnyFunSuite with LocalSparkSuite {

  /** Queries allowed an unpartitioned window: their window input is a
    * pre-aggregated, provably bounded grain (q65 runs over one row per
    * day — the documented daily-grain RANGE frame; q157's prefix-sum
    * windows run over one row per SOURCE, the waterfill's report-grain
    * solve). Everything else must partition: a global window over an
    * unbounded grain is a single-partition sort of the corpus at
    * 100 TB (the q74 lesson). */
  private val globalWindowAllowed =
    Set("q65_rolling_revenue", "q157_token_waterfill",
      // q160's rank/cumsum windows run over the top-10000
      // TakeOrderedAndProject cut — bounded BY DESIGN (a tokenizer's
      // candidate vocabulary), never corpus-grain
      "q160_vocab_coverage",
      // q198's global window runs over the HOUR GRAIN (corpus
      // span / 3600 rows) — the distributed-prefix-sum decomposition's
      // bounded phase; the corpus-grain running sum is the
      // hour-partitioned local window
      "q198_max_concurrency")

  /** Queries allowed a SortMergeJoin at the test scale. At sf0.001
    * EVERY join side sits far under the broadcast threshold, so the
    * optimizer picks broadcast (or the pinned shuffle_hash) for every
    * healthy join — a sort-merge join appearing here means a side's
    * stats were LOST, which is exactly how the checkpoint-derived
    * join regression presents (a checkpoint scan carries no stats and
    * defaults to huge — the q97 lesson documented at
    * StatsOps.pageRankAll). Queries that demo the merge join
    * explicitly via hint belong in this set, as do the bag set ops:
    * INTERSECT ALL / EXCEPT ALL desugar inside Spark's
    * RewriteIntersectAll/RewriteExceptAll to a FULL OUTER join that
    * broadcast hash cannot run and user hints cannot reach — and at
    * scale both sides are fact-grain, so merge join IS its plan.
    * Nothing else belongs here: q07's full outer carries a
    * shuffle_hash hint and q79/q84's checkpoint-backed labels join is
    * pinned shuffle_hash precisely because this guard caught it. */
  private val sortMergeAllowed = Set("q05_join_large", "q47_set_ops_bag")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans without cartesian products or global windows") {
      val qe = fn(spark, sfDir).queryExecution
      val plan = qe.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"unexpected CartesianProduct in $name:\n$plan")
      if (!sortMergeAllowed(name)) {
        assert(!plan.contains("SortMergeJoin"),
          s"SortMergeJoin in $name at sf0.001 — a join side lost its stats " +
            s"(checkpoint-derived frame? missing broadcast?):\n$plan")
      }
      if (!globalWindowAllowed(name)) {
        val global = qe.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        assert(global.isEmpty,
          s"unpartitioned Window in $name (single-partition sort at scale):\n" +
            global.mkString("\n"))
      }
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
