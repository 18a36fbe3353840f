package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded operator: a Spark query plus (when SQL-expressible) its
  * DuckDB oracle twin. The driver's t2 gate runs `fn` at sf0.01,
  * writes parquet, runs `oracle` in DuckDB over the same tables, and
  * hash-compares (columns sorted by name, rows in result order) — see
  * SURVEY.md §5. Determinism rules (SURVEY.md §2): total ORDER BY with
  * unique tie-break, no raw double aggregates (decimal-sum or ROUND),
  * pinned pivot values, UTC timestamps.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")
