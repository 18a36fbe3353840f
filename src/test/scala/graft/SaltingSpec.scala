package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew mitigation by salting (SCALING.md "Engine-level"): when one
  * key dominates, a two-phase aggregate over (key, salt) splits the
  * hot key across SALT partitions, then the tiny per-salt partials
  * re-aggregate — same result, no single-task hotspot. AQE's skew-join
  * handles joins; salting is the aggregation-side tool. */
class SaltingSpec extends AnyFunSuite with LocalSparkSuite {

  test("salted two-phase aggregation equals the direct aggregate") {
    import spark.implicits._
    val SALT = 8
    // skewed input: 90% of rows share one key
    val skewed = spark.range(100000)
      .select(when(col("id") % 10 =!= 0, lit("hot")).otherwise(concat(lit("k"), col("id") % 100))
        .as("key"), (col("id") % 7).cast("double").as("v"))
    val direct = skewed.groupBy(col("key"))
      .agg(sum(col("v")).as("total"), count(lit(1)).as("n"))
    val salted = skewed
      .withColumn("salt", pmod(hash(col("v"), monotonically_increasing_id()), lit(SALT)))
      .groupBy(col("key"), col("salt"))
      .agg(sum(col("v")).as("pt"), count(lit(1)).as("pn")) // phase 1: SALT-way split
      .groupBy(col("key"))
      .agg(sum(col("pt")).as("total"), sum(col("pn")).as("n")) // phase 2: merge partials
    val a = direct.orderBy("key").collect()
    val b = salted.orderBy("key").collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getString(0) === y.getString(0))
      assert(math.abs(x.getDouble(1) - y.getDouble(1)) < 1e-6)
      assert(x.getLong(2) === y.getLong(2))
    }
    // phase 1 really splits the hot key
    val hotSplits = skewed
      .withColumn("salt", pmod(hash(col("v"), monotonically_increasing_id()), lit(SALT)))
      .filter(col("key") === "hot").select(col("salt")).distinct().count()
    assert(hotSplits === SALT)
  }
}
