package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._
import graft.ops.{Relational, TextOps, VectorOps}

/** Per-operator properties + physical-plan shape checks (SURVEY.md §5.4).
  * The value-level correctness gate is the DuckDB differential
  * (scripts/oracle_check.py); these cover what SQL can't express. */
class OperatorSpec extends AnyFunSuite with LocalSparkSuite {

  test("plan: filters push down to the parquet scan") {
    val plan = Relational.filterScan(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"))
  }

  test("plan: star join broadcasts dimensions") {
    val plan = Relational.revenueByNation(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("plan: top-k is TakeOrderedAndProject, not a global sort") {
    val plan = Relational.topkOrders(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("plan: aggregation pipeline stays inside WholeStageCodegen") {
    val df = Relational.pricingSummary(spark, sfDir)
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks WholeStageCodegen stages; partial_sum
    // before the exchange confirms map-side combine
    assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(plan).isDefined)
    assert(plan.contains("partial_sum"))
  }

  test("plan: scan prunes to referenced columns only") {
    val plan = Relational.joinLarge(spark, sfDir)
      .queryExecution.executedPlan.toString
    // lineitem side should read only the join key + aggregated column
    assert(!plan.contains("l_comment") && !plan.contains("l_shipdate"))
  }

  test("plan: doc-local text ops shuffle only at the deliberate barriers") {
    // shingle stats: one fan-out repartition + the final sort — nothing else
    val stats = TextOps.shingleStats(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(stats).length <= 2, stats)
    // simhash: fan-out + sort only
    val sh = TextOps.simhash(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(sh).length <= 2, sh)
  }

  test("property: dedup is idempotent") {
    val once = TextOps.exactDedup(spark, sfDir)
    assert(once.count() === once.dropDuplicates("content_hash").count())
  }

  test("property: top-k ⊆ top-(k+5) and sorted") {
    val top10 = VectorOps.topkSimilar(spark, sfDir).collect()
    val sims = top10.map(_.getAs[Double]("cos_sim"))
    assert(sims.length === 10)
    assert(sims.sameElements(sims.sortBy(-_)))
  }

  test("property: cosine(v, v) ≈ 1") {
    val bad = Tables.embeddings(spark, sfDir)
      .select(cosineSim(col("embedding"), col("embedding")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-9).count()
    assert(bad === 0)
  }

  test("property: window rank stays within [1, 3] after filter") {
    val r = Relational.windowRank(spark, sfDir)
      .agg(min("rn").as("lo"), max("rn").as("hi")).head()
    assert(r.getAs[Int]("lo") === 1 && r.getAs[Int]("hi") <= 3)
  }

  test("property: union-all count additivity") {
    val a = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 250000)
    val b = Tables.orders(spark, sfDir).filter(col("o_totalprice") <= 250000)
    assert(a.count() + b.count() === a.union(b).count())
  }

  test("B13 approx_count_distinct within 10% of exact") {
    Relational.approxDistinct(spark, sfDir).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.10)
    }
  }

  test("B31 LSH candidates carry true cosine (spot check vs brute force)") {
    val ann = VectorOps.annLsh(spark, sfDir).collect()
    assert(ann.nonEmpty)
    val brute = VectorOps.topkSimilar(spark, sfDir)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    ann.foreach { r =>
      brute.get(r.getAs[Long]("vec_id")).foreach { c =>
        assert(math.abs(c - r.getAs[Double]("cos_sim")) < 1e-9)
      }
    }
  }

  test("custom Expression: codegen'd graft_dot is bit-identical to the HOF fold") {
    val diff = Tables.embeddings(spark, sfDir).alias("a")
      .join(Tables.embeddings(spark, sfDir).alias("b"),
        col("b.vec_id") === col("a.vec_id") + 1)
      .select((dotFast(col("a.embedding"), col("b.embedding")) -
        dotd(col("a.embedding"), col("b.embedding"))).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diff === 0)
  }

  test("graft_dot handles double and mixed float/double arrays like the HOF fold") {
    // the q87 scoring shape: float embedding against a computed double
    // centroid, plus a pure-double fold — all bit-identical to dotd
    val withD = Tables.embeddings(spark, sfDir)
      .withColumn("dv", col("embedding").cast("array<double>"))
    val diff = withD.alias("a")
      .join(withD.alias("b"), col("b.vec_id") === col("a.vec_id") + 1)
      .select(
        (dotFast(col("a.embedding"), col("b.dv")) -
          dotd(col("a.embedding"), col("b.dv"))).as("m"),
        (dotFast(col("a.dv"), col("b.dv")) -
          dotd(col("a.dv"), col("b.dv"))).as("d"))
      .filter(col("m") =!= 0.0 || col("d") =!= 0.0).count()
    assert(diff === 0)
  }

  test("A13 observe(): row-count metrics ride along the scan for free") {
    import org.apache.spark.sql.Observation
    val obs = Observation("ingest")
    val df = Tables.lineitem(spark, sfDir)
      .observe(obs, count(lit(1)).as("rows_seen"), sum(col("l_quantity")).as("qty_seen"))
      .filter(col("l_quantity") > 25)
    val kept = df.count()
    val seen = obs.get("rows_seen").asInstanceOf[Long]
    assert(seen === 6000L && kept < seen)
  }

  test("B36 UDF surface: base-36 sha1 matches JDK digest") {
    import spark.implicits._
    val got = Seq("hello wiki").toDF("t")
      .select(sha1Base36(col("t"))).head().getString(0)
    val d = java.security.MessageDigest.getInstance("SHA-1")
      .digest("hello wiki".getBytes("UTF-8"))
    assert(got === new java.math.BigInteger(1, d).toString(36))
  }

  test("minhash signature is stable across partitionings") {
    val a = TextOps.minhashSignatures(spark, sfDir).collect()
    val b = TextOps.minhashSignatures(spark, sfDir).repartition(7).orderBy("doc_id").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }
}
