package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions._
import graft.functions.WeightedMeanAgg

/** B36 user-defined function surface: scalar UDF, typed Aggregator
  * UDAF, and a flatMap-style UDTF equivalent. UDFs are opaque to
  * Catalyst (no pushdown through them), so graded queries keep them
  * OUT of filter position — they only produce output columns. */
object UdfOps {

  /** Typed-UDAF aggregate with an exact-arithmetic oracle twin. */
  def weightedAvgPrice(s: SparkSession, d: String): DataFrame = {
    val wavg = udaf(WeightedMeanAgg)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("w_avg_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private val weightedAvgPriceSql =
    """SELECT l_returnflag,
      | CAST(CAST(SUM(CAST(round(l_extendedprice*10000) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS VARCHAR) AS DOUBLE)
      |   / 10000.0 / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS w_avg_price,
      | COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Scalar-UDF query: MediaWiki-style base-36 sha1 of each document
    * (SURVEY.md §2.A10). DuckDB 1.0 has no sha1 → rows-only check. */
  def sha1Fingerprints(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), lpad(sha1Base36(col("text")), 31, "0").as("sha1_b36"))
      .orderBy(col("doc_id"))

  /** UDTF-equivalent (flatMap through a generator column): explode each
    * doc into fixed-width text chunks — the reference's "split long
    * text for storage" shape (MediaWiki text table rows). */
  def chunkDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      // empty docs emit zero chunks; the CASE guard matters because
      // Spark's sequence(0, -1) steps DOWN and would yield [0, -1]
      .select(col("doc_id"),
        posexplode(expr("CASE WHEN n_chars > 0 THEN " +
          "transform(sequence(0, CAST(ceil(n_chars/100.0) AS INT) - 1), " +
          "i -> substring(text, i*100 + 1, 100)) " +
          "ELSE CAST(array() AS array<string>) END")))
      .select(col("doc_id"), col("pos").as("chunk_no"), col("col").as("body"))
      .orderBy(col("doc_id"), col("chunk_no"))

  private val chunkDocsSql =
    """SELECT doc_id, CAST(i AS INT) AS chunk_no, substring(text, CAST(i*100 + 1 AS INT), 100) AS body
      |FROM documents,
      |  (SELECT unnest(generate_series(0,
      |     (SELECT CAST(ceil(max(n_chars)/100.0) AS BIGINT) FROM documents))) AS i) g
      |WHERE i <= CAST(ceil(n_chars/100.0) AS INT) - 1
      |ORDER BY doc_id, chunk_no""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q28_udaf_weighted_avg", weightedAvgPrice, Some(weightedAvgPriceSql), "B36 typed Aggregator UDAF"),
    QueryDef("q29_chunk_docs", chunkDocs, Some(chunkDocsSql), "B36 UDTF-equivalent generator"),
    QueryDef("q70_sha1_base36", sha1Fingerprints, None, "B36 scalar UDF / A10 sha1 (non-oracle)"))
}
