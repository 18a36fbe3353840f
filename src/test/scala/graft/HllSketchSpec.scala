package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.hllDistinct

/** Grades the B37 TypedImperativeAggregate (q78 is declared non-oracle
  * like q27): estimate accuracy against the exact count, invariance to
  * partitioning (the estimate is a pure function of the value SET), and
  * the SparkSessionExtensions SQL registration. */
class HllSketchSpec extends AnyFunSuite with LocalSparkSuite {

  test("hll estimate is within the p=12 error bound of the exact count") {
    val rows = ops.Relational.hllSketchDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      // 1.04/sqrt(4096) = 1.6% standard error; 5% is > 3 sigma
      assert(math.abs(est - exact) <= math.max(3.0, 0.05 * exact),
        s"estimate $est too far from exact $exact for ${r.getString(0)}")
    }
  }

  test("estimate is independent of partitioning and row order") {
    val vals = Tables.lineitem(spark, sfDir).select(col("l_partkey"))
    def est(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(hllDistinct(col("l_partkey")).as("e")).head().getLong(0)
    val one = est(vals.repartition(1))
    val many = est(vals.repartition(13, col("l_partkey")))
    val sorted = est(vals.orderBy(col("l_partkey").desc))
    assert(one === many && many === sorted)
  }

  test("precision scales the register budget and tightens the estimate") {
    val df = Tables.orders(spark, sfDir)
    val exact = df.select(countDistinct(col("o_custkey"))).head().getLong(0).toDouble
    val loose = df.agg(hllDistinct(col("o_custkey"), 7)).head().getLong(0).toDouble
    val tight = df.agg(hllDistinct(col("o_custkey"), 14)).head().getLong(0).toDouble
    assert(math.abs(tight - exact) / exact <= 0.05)
    assert(math.abs(loose - exact) / exact <= 0.30) // 9.2% sigma at p=7
  }

  test("graft_hll_distinct is SQL-registered via GraftExtensions") {
    // the shared test session predates extension wiring, so register
    // the ACTUAL builder tuples the extension injects — a broken
    // injection lambda must fail here, not just a hand-rolled copy
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs_hll")
    val viaSql = spark.sql(
      "SELECT graft_hll_distinct(doc_id) FROM docs_hll").head().getLong(0)
    val viaCol = Tables.documents(spark, sfDir)
      .agg(hllDistinct(col("doc_id"))).head().getLong(0)
    assert(viaSql === viaCol)
  }

  test("graft_hll_distinct honors a SQL precision argument and rejects bad arity") {
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_hll")
    val viaSql = spark.sql(
      "SELECT graft_hll_distinct(o_custkey, 14) FROM orders_hll").head().getLong(0)
    val viaCol = Tables.orders(spark, sfDir)
      .agg(hllDistinct(col("o_custkey"), 14)).head().getLong(0)
    assert(viaSql === viaCol)
    // estimates can coincide across precisions at small cardinality, so
    // also check the builder structurally: the 2-arg form must carry
    // the precision into the aggregate, the 3-arg form must throw
    val hllBuilder = GraftExtensions.functions
      .find(_._1.funcName == "graft_hll_distinct").get._3
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    val child = AttributeReference("x", org.apache.spark.sql.types.LongType)()
    val built = hllBuilder(Seq(child, Literal(14)))
      .asInstanceOf[AggregateExpression].aggregateFunction
      .asInstanceOf[graft.functions.HllSketchAgg]
    assert(built.precision === 14)
    intercept[Exception] { hllBuilder(Seq(child, Literal(14), Literal(99))) }
    intercept[Exception] {
      spark.sql("SELECT graft_hll_distinct(o_custkey, 14, 99) FROM orders_hll").head()
    }
  }
}
