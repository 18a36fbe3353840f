package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q105: the WWW'07 pigeonhole, demonstrated — the 4x16-bit band join
  * must find EXACTLY the pairs a brute-force all-pairs Hamming scan
  * over the same 64-bit signatures finds (no lost pair = the
  * pigeonhole's perfect recall for distance <= 3; no extra pair = the
  * exact bit_count verify works), plus signature-shape invariants. */
class SimhashJoinSpec extends AnyFunSuite with LocalSparkSuite {

  // the exact signature frame the operator joins on — via the same
  // builder, so the spec holds whether the memo is enabled (checkpoint
  // reuse) or disabled (SPARK_GRAFT_MEMO=false rebuilds it here)
  private def signatures = graft.ops.TextOps.simhashSignatures(spark, sfDir)

  test("band join = brute-force all-pairs Hamming scan over the signatures") {
    val sig = signatures
    val ham = (0 until 4).map(b =>
      bit_count(col(s"a$b").bitwiseXOR(col(s"c$b")))).reduce(_ + _)
    val brute = sig.select(col("doc_id").as("doc_a"), col("b0").as("a0"),
        col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
      .crossJoin(sig.select(col("doc_id").as("doc_b"), col("b0").as("c0"),
        col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3")))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", ham.cast("long"))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = graft.ops.TextOps.simhashJoin(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded === brute)
  }

  test("signatures: one row per distinct text, bands inside 16 bits") {
    val sig = signatures
    val reps = Tables.documents(spark, sfDir)
      .select(col("text")).distinct().count()
    assert(sig.count() === reps)
    val bad = sig.filter((0 until 4).map(b =>
      col(s"b$b") < 0 || col(s"b$b") > 65535).reduce(_ || _)).count()
    assert(bad === 0)
  }

  test("identical texts produce identical signatures (and never join themselves)") {
    val out = graft.ops.TextOps.simhashJoin(spark, sfDir)
    // the exact-dedup precondition keeps one rep per text, so no
    // result pair may have hamming coming from two copies of the same
    // text (those never appear as separate rows)
    val texts = Tables.documents(spark, sfDir)
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    out.collect().foreach { r =>
      assert(texts.contains(r.getLong(0)) && texts.contains(r.getLong(1)))
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 3)
    }
  }
}
