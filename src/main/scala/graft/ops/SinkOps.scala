package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.ingest.Sinks

/** The graded leg of the JDBC sink surface (VERDICT_r13 #4): A11's
  * batched load and A17's keyed upsert were spec-verified only
  * (SinksSpec replay-idempotence); q190 puts the full
  * write → upsert → read-back loop under the DuckDB oracle gate.
  */
object SinkOps {

  /** q190: JDBC ROUND-TRIP — stale bulk load, keyed upsert, read-back.
    * The ETL shape the reference's importer actually runs: a full
    * batch load lands first-pass per-nation order stats computed from
    * a PARTIAL slice (orders with o_orderkey % 4 = 0 — the "yesterday's
    * import" state), then the incremental pass upserts fresh full
    * stats for HALF the keys (odd nation_key) through
    * [[Sinks.upsertJdbc]]'s delete+insert transaction, and the query
    * returns the table read back through the JDBC scan. The oracle
    * never sees the database: it computes the expected POST-upsert
    * state directly (full stats for odd nations, stale stats
    * otherwise), so any sink defect — dropped rows, double inserts,
    * non-idempotent replay, column mangling through Derby's quoted
    * identifiers — breaks the hash match. All measures are exact
    * integers (counts + key sums); nothing float crosses the sink.
    *
    * Derby embedded/in-memory stands in for the warehouse exactly as
    * in SinksSpec; at scale the URL points at a real network RDBMS
    * and nothing else changes (the write path repartitions by key, so
    * one task owns a key's row — no cross-task races). The
    * overwrite-then-upsert sequence makes the query idempotent across
    * invocations in one JVM (Verify and Bench both call it twice). */
  def jdbcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val url = "jdbc:derby:memory:graft_q190;create=true"
    val table = "q190_sink"
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"))
    def statsOf(o: DataFrame): DataFrame = o
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nation_key"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_orderkey")).as("key_sum"))
    // pass 1: the stale bulk load (overwrite drops + recreates, so the
    // query is deterministic no matter what an earlier call left).
    // ONE writer task throughout: the sink frame is 25 keys on a
    // single Derby page, so any write parallelism just queues on page
    // locks (measured: numPartitions=4 turned this query into 81 s of
    // embedded-Derby lock waits; 1 partition runs it in ~2 s). Sizing
    // write parallelism to the TARGET's ingest width, not the
    // cluster's, is exactly the guidance Sinks.writeJdbc documents.
    val stale = statsOf(orders.filter(col("o_orderkey") % 4 === 0))
    Sinks.writeJdbc(stale, url, table, numPartitions = 1)
    // pass 2: fresh full stats for the odd-key half, upserted
    val fresh = statsOf(orders).filter(col("nation_key") % 2 === 1)
    Sinks.upsertJdbc(fresh, url, table, Seq("nation_key"), numPartitions = 1)
    // replay the SAME upsert — exactly-once table state under the
    // at-least-once delivery A17 contracts for (idempotence is part
    // of what the oracle certifies, not just SinksSpec)
    Sinks.upsertJdbc(fresh, url, table, Seq("nation_key"), numPartitions = 1)
    Sinks.readJdbc(s, url, table)
      .select(col("nation_key").cast("long"),
        col("n_orders").cast("long"), col("key_sum").cast("long"))
      .orderBy(col("nation_key"))
  }

  private val jdbcRoundtripSql =
    """WITH stale AS (
      |  SELECT c.c_nationkey AS nation_key,
      |         count(*) AS n_orders, sum(o.o_orderkey) AS key_sum
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE o.o_orderkey % 4 = 0 GROUP BY 1),
      |fresh AS (
      |  SELECT c.c_nationkey AS nation_key,
      |         count(*) AS n_orders, sum(o.o_orderkey) AS key_sum
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_nationkey % 2 = 1 GROUP BY 1)
      |SELECT CAST(COALESCE(f.nation_key, s.nation_key) AS BIGINT) AS nation_key,
      |       CAST(COALESCE(f.n_orders, s.n_orders) AS BIGINT) AS n_orders,
      |       CAST(COALESCE(f.key_sum, s.key_sum) AS BIGINT) AS key_sum
      |FROM stale s FULL OUTER JOIN fresh f ON s.nation_key = f.nation_key
      |ORDER BY nation_key""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q190_jdbc_roundtrip", jdbcRoundtrip, Some(jdbcRoundtripSql),
      "A11/A17 under the oracle: JDBC bulk load + keyed upsert + read-back"))
}
