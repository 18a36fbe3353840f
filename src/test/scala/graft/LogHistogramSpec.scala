package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.logPercentiles

/** B37 #4: the log-histogram quantile sketch — error contract,
  * partitioning independence (the property KLL/t-digest can't offer),
  * exactness below 2^(m+1), null/negative handling, and the injected
  * SQL builder. */
class LogHistogramSpec extends AnyFunSuite with LocalSparkSuite {

  private def seqDf(xs: Seq[Long], parts: Int) = {
    import spark.implicits._
    xs.toDF("v").repartition(parts)
  }

  test("estimates stay inside the 2^-(m+1) relative-error contract") {
    import spark.implicits._
    // heavy-tailed values spanning many octaves
    val xs = (1 to 20000).map(i => (i.toLong * i * 17) % 900001 + 100)
    val est = seqDf(xs, 8)
      .agg(logPercentiles(col("v"), Seq(0.5, 0.9, 0.99))).head
      .getSeq[Long](0)
    val sorted = xs.sorted
    def exact(q: Double) = sorted(math.ceil(q * xs.size).toInt - 1)
    Seq(0.5, 0.9, 0.99).zipWithIndex.foreach { case (q, i) =>
      val e = exact(q).toDouble
      assert(math.abs(est(i) - e) <= e / 256.0 + 1,
        s"q=$q est=${est(i)} exact=$e")
    }
  }

  test("partitioning-independent: 1 vs 32 partitions, identical arrays") {
    val xs = (1 to 5000).map(i => (i.toLong * 7919) % 1000000)
    val a = seqDf(xs, 1)
      .agg(logPercentiles(col("v"), Seq(0.25, 0.5, 0.75, 0.95))).head.getSeq[Long](0)
    val b = seqDf(xs, 32)
      .agg(logPercentiles(col("v"), Seq(0.25, 0.5, 0.75, 0.95))).head.getSeq[Long](0)
    assert(a === b)
  }

  test("values below 2^(m+1) are exact order statistics") {
    val xs = (1L to 200L)
    val est = seqDf(xs, 4)
      .agg(logPercentiles(col("v"), Seq(0.5, 1.0))).head.getSeq[Long](0)
    assert(est === Seq(100L, 200L))
  }

  test("nulls are skipped, negatives clamp to bucket zero") {
    import spark.implicits._
    val df = Seq[Option[Long]](Some(-5L), None, Some(10L), Some(10L), Some(10L))
      .toDF("v")
    val est = df.agg(logPercentiles(col("v"), Seq(0.25, 0.75))).head.getSeq[Long](0)
    // 4 non-null values: rank(.25)=1 -> the clamped negative (0),
    // rank(.75)=3 -> 10 exactly
    assert(est === Seq(0L, 10L))
  }

  test("graft_log_percentiles is SQL-registered, honors m, rejects bad args") {
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("li_logp")
    val viaSql = spark.sql(
      """SELECT graft_log_percentiles(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
        |       array(0.5, 0.99)) FROM li_logp""".stripMargin)
      .head.getSeq[Long](0)
    val viaCol = Tables.lineitem(spark, sfDir)
      .agg(logPercentiles(floor(col("l_extendedprice") * 100 + 0.5).cast("long"),
        Seq(0.5, 0.99))).head.getSeq[Long](0)
    assert(viaSql === viaCol)
    // 3-arg form changes the error band: coarser m -> different bucket
    val coarse = spark.sql(
      """SELECT graft_log_percentiles(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
        |       array(0.5), 3) FROM li_logp""".stripMargin).head.getSeq[Long](0)
    assert(math.abs(coarse.head - viaSql.head).toDouble / viaSql.head <= 1.0 / 16 + 0.01)
    intercept[Exception] {
      spark.sql("SELECT graft_log_percentiles(l_orderkey) FROM li_logp").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_log_percentiles(l_orderkey, 0.5) FROM li_logp").collect()
    }
  }
}
