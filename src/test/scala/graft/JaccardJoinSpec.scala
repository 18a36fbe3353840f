package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q104: the prefix-filtering lemma, demonstrated — the rarest-first
  * prefix join must find EXACTLY the pairs brute-force all-pairs
  * Jaccard finds (no lost pair = recall; no extra pair = the exact
  * verify works). Run at three thresholds: the q104 instance
  * (tau = 1/2) plus a looser (1/3) and a tighter (2/3) bound, so the
  * general `n - ceil(tau*n) + 1` prefix length is exercised away from
  * the `n div 2 + 1` special case. */
class JaccardJoinSpec extends AnyFunSuite with LocalSparkSuite {

  /** Brute force over one representative per distinct text: every
    * pair sharing ANY shingle, exact Jaccard >= p/q. The gate stays
    * in the integer domain (q*inter >= p*union), same as the
    * operator, so the comparison has no float slack on either side. */
  private def bruteForce(p: Int, q: Int): Set[(Long, Long)] = {
    val sh = Tables.documents(spark, sfDir)
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.GraftFunctions.shingles(col("toks"), 3))).as("shingle"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    sh.select(col("doc_id").as("da"), col("shingle"))
      .join(sh.select(col("doc_id").as("db"), col("shingle")), Seq("shingle"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .filter(col("inter") * q >= (col("na") + col("nb") - col("inter")) * p)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def prefixFiltered(p: Int, q: Int): Set[(Long, Long)] =
    graft.ops.TextOps.jaccardJoinAt(spark, sfDir, p, q)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("prefix-filtered join = brute-force all-pairs at tau 1/2 (the q104 instance)") {
    val got = graft.ops.TextOps.jaccardJoin(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = bruteForce(1, 2)
    assert(got === expected)
    assert(expected.nonEmpty, "fixture corpus should contain near-dup pairs")
  }

  test("prefix-filtered join = brute-force all-pairs at tau 1/3") {
    val expected = bruteForce(1, 3)
    assert(prefixFiltered(1, 3) === expected)
    // a looser tau must admit at least the tau=1/2 pairs
    assert(bruteForce(1, 2).subsetOf(expected))
  }

  test("prefix-filtered join = brute-force all-pairs at tau 2/3") {
    val expected = bruteForce(2, 3)
    assert(prefixFiltered(2, 3) === expected)
    // a tighter tau must admit no more than the tau=1/2 pairs
    assert(expected.subsetOf(bruteForce(1, 2)))
  }

  test("containment join = brute-force all-ordered-pairs at tau 3/4 (q131)") {
    val sh = Tables.documents(spark, sfDir)
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.GraftFunctions.shingles(col("toks"), 3))).as("shingle"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val sets = sh.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      a <- ids.iterator; b <- ids.iterator if a != b
      inter = sets(a).intersect(sets(b)).size
      if inter * 4 >= sets(a).size * 3
    } yield (a, b) -> ((sets(a).size.toLong, sets(b).size.toLong,
      inter.toDouble / sets(a).size))).toMap
    val got = graft.ops.TextOps.containmentJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === expected)
    assert(expected.nonEmpty)
    // the measure is directional: where sizes differ, the two
    // directions score differently (pure one-direction qualification
    // needs a true subset pair, which this fixture corpus lacks)
    assert(expected.exists { case ((a, b), (na, nb, c)) =>
      na != nb && expected.get((b, a)).forall(_._3 != c)
    })
  }
}
