package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB fact-fact join story, demonstrated: bucketing both
  * tables on the join key makes the sort-merge join exchange-free
  * (SCALING.md "Relational core"). At cluster scale this is the
  * difference between shuffling two 10 TB tables per query and
  * shuffling nothing — the write pays the shuffle once. */
class BucketingSpec extends AnyFunSuite with LocalSparkSuite {

  test("co-located bucketed join plans with zero exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Tables.lineitem(spark, sfDir)
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$dir/lineitem_b").saveAsTable("lineitem_b")
      Tables.orders(spark, sfDir)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$dir/orders_b").saveAsTable("orders_b")

      // no broadcast: prove the co-located sort-merge path itself
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderdate"), col("l_extendedprice"))
      assert(joined.count() === 6000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)

      // same join over the raw (unbucketed) parquet shuffles both sides
      val raw = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderdate"))
      raw.count()
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
