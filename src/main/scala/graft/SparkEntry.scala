package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is declared here as a named query;
  * the oracle map carries the DuckDB twin for the t2 differential gate.
  * Definitions live in graft.ops.* keyed by capability family.
  */
object SparkEntry {

  private lazy val all: Seq[QueryDef] =
    ops.Relational.defs ++ ops.TextOps.defs ++ ops.VectorOps.defs ++
      ops.WindowedOps.defs ++ ops.UdfOps.defs ++ ops.MultimodalOps.defs ++
      ops.CurationOps.defs ++ ops.StatsOps.defs ++ ops.WikitextOps.defs ++
      ops.SinkOps.defs ++ ops.XmlOps.defs ++ ops.StreamGradedOps.defs

  /** Flagship query (broadcast star join → agg → sort) on sf0.001;
    * driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
