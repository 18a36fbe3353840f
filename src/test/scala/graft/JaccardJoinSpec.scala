package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q104: the prefix-filtering lemma, demonstrated — the rarest-first
  * prefix join must find EXACTLY the pairs brute-force all-pairs
  * Jaccard finds at tau = 0.5 (no lost pair = recall; no extra pair =
  * the exact verify works). */
class JaccardJoinSpec extends AnyFunSuite with LocalSparkSuite {

  test("prefix-filtered join = brute-force all-pairs at tau 0.5") {
    val got = graft.ops.TextOps.jaccardJoin(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute force over the same representatives (one per distinct
    // text): every pair sharing ANY shingle, exact Jaccard
    val sh = Tables.documents(spark, sfDir)
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.GraftFunctions.shingles(col("toks"), 3))).as("shingle"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = sh.select(col("doc_id").as("da"), col("shingle"))
      .join(sh.select(col("doc_id").as("db"), col("shingle")), Seq("shingle"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .filter(col("inter").cast("double") / (col("na") + col("nb") - col("inter")) >= 0.5)
    val expected = pairs.select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got === expected)
    assert(expected.nonEmpty, "fixture corpus should contain near-dup pairs")
  }
}
