package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions._

/** Relational operator surface — SURVEY.md §2.B1–B24.
  *
  * Every query is a pure `(SparkSession, sfDir) => DataFrame` with a
  * DuckDB oracle twin; all follow the determinism rules of SURVEY.md §2
  * (total ORDER BY + unique tie-break, exact-decimal aggregation, no
  * cross-engine-ambiguous rounding).
  *
  * Scale posture (the 100 TB story, per query in its scaladoc):
  * dimension joins are broadcast; fact-fact joins shuffle on their keys
  * and would be bucket-co-located in a catalog deployment; aggregations
  * are partial (map-side combine) by construction since everything is
  * declarative — Catalyst/Tungsten handle partial agg, pushdown, and
  * pruning (verified via explain() in RelationalSpec).
  */
object Relational {

  private val ts = (s: String) => lit(s).cast("timestamp")

  /** B10 hash aggregate — TPC-H Q1-shaped pricing summary.
    * Map-side partial agg on 4 groups → ~no shuffle payload at any SF. */
  def pricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val pricingSummarySql =
    s"""SELECT l_returnflag, l_linestatus,
       | ${dsumSql("l_quantity")} AS sum_qty,
       | ${dsumSql("l_extendedprice")} AS sum_base_price,
       | ${dsumSql("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
       | ${dsumSql("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
       | ${davgSql("l_quantity")} AS avg_qty,
       | ${davgSql("l_extendedprice")} AS avg_price,
       | ${davgSql("l_discount")} AS avg_disc,
       | COUNT(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** B1/B2 parquet scan + conjunctive predicates (range, BETWEEN, IN, <).
    * All four predicates push to the parquet reader (row-group skip). */
  def filterScan(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-07-01")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24
        && col("l_returnflag").isin("N", "A"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val filterScanSql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      |  AND l_returnflag IN ('N','A')
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** B3 projection + scalar expressions (CASE, derived money).
    * Derived money goes through the exact-decimal recovery cast. */
  def projectCase(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        (col("o_totalprice") * 1.1).cast(MoneyDec).cast("double").as("gross"),
        concat_ws("/", col("o_orderstatus"), col("o_orderpriority")).as("status_tag"))
      .orderBy(col("o_orderkey"))

  private val projectCaseSql =
    """SELECT o_orderkey,
      | CASE WHEN o_totalprice > 300000 THEN 'big' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
      | CAST(CAST(o_totalprice * 1.1 AS DECIMAL(28,8)) AS DOUBLE) AS gross,
      | CONCAT_WS('/', o_orderstatus, o_orderpriority) AS status_tag
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** B4 star join, broadcast dimensions — the flagship (SparkEntry.entry).
    * lineitem⋈orders shuffles on the order key (bucket-co-locatable at
    * 100 TB); customer/nation/region are broadcast — no shuffle for any
    * dimension at any scale. */
  def revenueByNation(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val revenueByNationSql =
    s"""SELECT n_name, ${dsumSql("l_extendedprice*(1-l_discount)")} AS revenue, COUNT(*) AS n_items
       |FROM lineitem
       | JOIN orders   ON l_orderkey = o_orderkey
       | JOIN customer ON o_custkey = c_custkey
       | JOIN nation   ON c_nationkey = n_nationkey
       | JOIN region   ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** B4/B16 compound: unshipped-revenue priority (TPC-H Q3 shape —
    * join → agg on a high-cardinality key → top-k). */
  def shippingPriority(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).filter(col("l_shipdate") > ts("1996-03-15"))
      .join(Tables.orders(s, d).filter(col("o_orderdate") < ts("1996-03-15")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  private val shippingPrioritySql =
    s"""SELECT l_orderkey, o_orderdate, ${dsumSql("l_extendedprice*(1-l_discount)")} AS revenue
       |FROM lineitem
       | JOIN orders ON l_orderkey = o_orderkey
       | JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1996-03-15' AND l_shipdate > TIMESTAMP '1996-03-15'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** B2/B10 compound: forecast-revenue change (TPC-H Q6 shape — pure
    * scan-filter-aggregate, one row out; the pushdown benchmark). */
  def forecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue_delta"),
        count(lit(1)).as("n_items"))

  private val forecastRevenueSql =
    s"""SELECT ${dsumSql("l_extendedprice*l_discount")} AS revenue_delta, COUNT(*) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** B5 fact-fact join (shuffle/sort-merge at scale) + aggregate. */
  def joinLarge(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice")).as("total_price"))
      .orderBy(col("o_orderpriority"))

  private val joinLargeSql =
    s"""SELECT o_orderpriority, COUNT(*) AS n_items, ${dsumSql("l_extendedprice")} AS total_price
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** B6 left outer join + aggregate over the nullable side. */
  def leftJoinOrders(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spend"))
      .orderBy(col("c_custkey"))

  private val leftJoinOrdersSql =
    s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
       | ${dsumSql("COALESCE(o_totalprice, 0)")} AS total_spend
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin

  /** B6 full outer join of two aggregates (nation coverage differs).
    * FULL OUTER is the one equi-join shape broadcast hash can't run
    * (both sides must emit unmatched rows), so the planner's default
    * is a sort-merge join; the shuffle_hash hint on the build side
    * keeps the same single exchange but hashes instead of sorting both
    * sides — the bounded-slice plan at any scale (cf. q92's salted
    * join, where the same pairing is what makes salting profitable). */
  def fullOuterNation(s: SparkSession, d: String): DataFrame = {
    val cn = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_customers"))
    val sn = Tables.supplier(s, d).groupBy(col("s_nationkey").as("snk"))
      .agg(count(lit(1)).as("n_suppliers"))
      .hint("shuffle_hash")
    cn.join(sn, col("nk") === col("snk"), "full_outer")
      .select(coalesce(col("nk"), col("snk")).as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy(col("nationkey"))
  }

  private val fullOuterNationSql =
    """WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY 1),
      |     sn AS (SELECT s_nationkey AS snk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1)
      |SELECT COALESCE(nk, snk) AS nationkey,
      |       COALESCE(n_customers, 0) AS n_customers,
      |       COALESCE(n_suppliers, 0) AS n_suppliers
      |FROM cn FULL JOIN sn ON nk = snk ORDER BY nationkey""".stripMargin

  /** B7 anti join: customers with no 400k+ order. */
  def antiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  private val antiJoinSql =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  /** B7 semi join: parts that ever shipped in quantity ≥ 48. */
  def semiJoin(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 48),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
      .orderBy(col("p_partkey"))

  private val semiJoinSql =
    """SELECT p_partkey, p_name, p_brand FROM part
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 48)
      |ORDER BY p_partkey""".stripMargin

  /** B8 range (theta) band join against a tiny inline dimension —
    * broadcast nested-loop; the band table never shuffles the fact. */
  def rangeBandJoin(s: SparkSession, d: String): DataFrame = {
    val bands = s.createDataFrame(Seq(
      (0.0, 10.0, "low"), (10.0, 30.0, "mid"), (30.0, 100.0, "high")))
      .toDF("lo", "hi", "band")
    Tables.lineitem(s, d)
      .join(broadcast(bands), col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_items"), davg(col("l_extendedprice")).as("avg_price"))
      .orderBy(col("band"))
  }

  private val rangeBandJoinSql =
    s"""SELECT band, COUNT(*) AS n_items, ${davgSql("l_extendedprice")} AS avg_price
       |FROM lineitem JOIN (VALUES (0.0,10.0,'low'),(10.0,30.0,'mid'),(30.0,100.0,'high')) b(lo, hi, band)
       |  ON l_quantity >= lo AND l_quantity < hi
       |GROUP BY band ORDER BY band""".stripMargin

  /** B9 as-of join: for each purchase, the latest view at ts ≤ purchase
    * ts by the same user. Implemented the scale-correct way: one shuffle
    * on user_id and a running `last(view ts)` window — no join blow-up,
    * no per-key driver loop; DuckDB's native ASOF JOIN is the oracle. */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts")) // default RANGE frame → ts-ties included, matching <=
    Tables.events(s, d)
      .withColumn("view_ts",
        last(when(col("event_type") === "view", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("view_ts"))
      .orderBy(col("event_id"))
  }

  private val asofJoinSql =
    """SELECT p.event_id, p.user_id, p.ts, v.ts AS view_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND v.ts <= p.ts
      |ORDER BY p.event_id""".stripMargin

  /** B11 rollup + grouping_id. */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val rollupAggSql =
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${dsumSql("l_quantity")} AS sum_qty,
       | CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** B11 cube. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val cubeAggSql =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total,
       | CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
       |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** B11 explicit GROUPING SETS through the SQL entry point (rollup and
    * cube are the shorthand forms; this is the general one). */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,8))) AS STRING) AS DOUBLE) AS total,
        | CAST(grouping_id() AS BIGINT) AS gid
        |FROM lineitem_v
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  private val groupingSetsSql =
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       | ${dsumSql("l_extendedprice")} AS total,
       | CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
       |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** B12 distinct. */
  def distinctPairs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey"))

  private val distinctPairsSql =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** B14 ranking window: top-3 orders per customer. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("int"))
      .withColumn("rnk", rank().over(w).cast("int"))
      .withColumn("drnk", dense_rank().over(w).cast("int"))
      .withColumn("quartile", ntile(4).over(w).cast("int"))
      // percent_rank/cume_dist are exact integer ratios (one IEEE
      // division) and the unique o_orderkey tiebreak removes frame
      // peers, so all three are cross-engine deterministic
      .withColumn("prank", percent_rank().over(w))
      .withColumn("cdist", cume_dist().over(w))
      .withColumn("second_ok",
        nth_value(col("o_orderkey"), 2)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val windowRankSql =
    """SELECT * FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn,
      |  CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk,
      |  CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS drnk,
      |  CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS quartile,
      |  PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS prank,
      |  CUME_DIST() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS cdist,
      |  NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_ok
      | FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** B15 analytic window: per-user running sum + lag/lead. */
  def windowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("run_sum",
        sum(col("value").cast(MoneyDec))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .withColumn("first_value",
        first(col("value")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("event_id"))
  }

  private val windowRunningSql =
    """SELECT event_id, user_id, ts, value,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(28,8))) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS run_sum,
      | LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      | LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
      | FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value
      |FROM events ORDER BY event_id""".stripMargin

  /** B16 top-k (TakeOrderedAndProject: per-partition top-k then merge —
    * never a full sort at scale). */
  def topkOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  private val topkOrdersSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** B17 set ops: 3-way membership split (EXCEPT / INTERSECT / UNION ALL). */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val a = Tables.customer(s, d).filter(col("c_acctbal") > 8000)
      .select(col("c_custkey").as("custkey"))
    val b = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
      .select(col("o_custkey").as("custkey")).distinct()
    a.except(b).withColumn("side", lit("high_bal_only"))
      .union(b.except(a).withColumn("side", lit("big_order_only")))
      .union(a.intersect(b).withColumn("side", lit("both")))
      .orderBy(col("custkey"), col("side"))
  }

  private val setOpsSql =
    """WITH a AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000),
      |     b AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000)
      |SELECT custkey, 'high_bal_only' AS side FROM (SELECT custkey FROM a EXCEPT SELECT custkey FROM b)
      |UNION ALL
      |SELECT custkey, 'big_order_only' AS side FROM (SELECT custkey FROM b EXCEPT SELECT custkey FROM a)
      |UNION ALL
      |SELECT custkey, 'both' AS side FROM (SELECT custkey FROM a INTERSECT SELECT custkey FROM b)
      |ORDER BY custkey, side""".stripMargin

  /** B17 bag-semantics set ops (INTERSECT ALL / EXCEPT ALL keep
    * multiplicities — the SQL-standard twin of the distinct forms in
    * q18). Operand: per-order line counts as a multiset of quantities. */
  def setOpsBag(s: SparkSession, d: String): DataFrame = {
    val a = Tables.lineitem(s, d).filter(col("l_returnflag") === "N")
      .select(col("l_quantity").cast("int").as("qty"))
    val b = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_quantity").cast("int").as("qty"))
    a.intersectAll(b).groupBy(col("qty")).agg(count(lit(1)).as("n_common"))
      .join(a.exceptAll(b).groupBy(col("qty")).agg(count(lit(1)).as("n_n_only")),
        Seq("qty"), "full_outer")
      .select(col("qty"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("n_n_only"), lit(0L)).as("n_n_only"))
      .orderBy(col("qty"))
  }

  private val setOpsBagSql =
    """WITH a AS (SELECT CAST(l_quantity AS INT) AS qty FROM lineitem WHERE l_returnflag = 'N'),
      |     b AS (SELECT CAST(l_quantity AS INT) AS qty FROM lineitem WHERE l_returnflag = 'R'),
      |     ia AS (SELECT qty, COUNT(*) AS n_common FROM (SELECT qty FROM a INTERSECT ALL SELECT qty FROM b) GROUP BY qty),
      |     ea AS (SELECT qty, COUNT(*) AS n_n_only FROM (SELECT qty FROM a EXCEPT ALL SELECT qty FROM b) GROUP BY qty)
      |SELECT qty, COALESCE(n_common, 0) AS n_common, COALESCE(n_n_only, 0) AS n_n_only
      |FROM ia FULL JOIN ea USING (qty) ORDER BY qty""".stripMargin

  /** B18 string functions (all codegen'd builtins, no UDFs). */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_name").like("%o%"))
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        concat_ws("-", col("p_brand"), col("p_size").cast("string")).as("tag"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
        split(col("p_name"), " ").getItem(1).as("second_tok"))
      .orderBy(col("p_partkey"))

  private val stringFuncsSql =
    """SELECT p_partkey,
      | UPPER(p_brand) AS brand_u,
      | LOWER(p_type) AS type_l,
      | SUBSTRING(p_name, 1, 5) AS name_pfx,
      | CONCAT_WS('-', p_brand, CAST(p_size AS VARCHAR)) AS tag,
      | CAST(LENGTH(p_name) AS INT) AS name_len,
      | REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
      | REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS no_vowels,
      | string_split(p_name, ' ')[2] AS second_tok
      |FROM part WHERE p_name LIKE '%o%' ORDER BY p_partkey""".stripMargin

  /** B19 date parts aggregation. */
  def dateParts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"),
        min(unix_timestamp(col("o_orderdate"))).as("first_epoch"))
      .withColumn("month_start", make_date(col("yr"), col("mo"), lit(1)))
      .orderBy(col("yr"), col("mo"))

  private val datePartsSql =
    s"""SELECT CAST(YEAR(o_orderdate) AS INT) AS yr, CAST(MONTH(o_orderdate) AS INT) AS mo,
       | COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total,
       | CAST(epoch(MIN(o_orderdate)) AS BIGINT) AS first_epoch,
       | make_date(CAST(YEAR(o_orderdate) AS INT), CAST(MONTH(o_orderdate) AS INT), 1) AS month_start
       |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin

  /** B19 datediff: ship delay per priority (lineitem⋈orders). */
  def shipDelay(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        (sum(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))).cast("double")
          / count(lit(1))).as("avg_delay_days"))
      .orderBy(col("o_orderpriority"))

  private val shipDelaySql =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      | CAST(SUM(DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS DOUBLE)/COUNT(*) AS avg_delay_days
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** B20 math functions. ln/sqrt outputs are irrational → ROUND(6) is
    * tie-safe; integer-valued floor/ceil/sign/pow are exact. */
  def mathFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 500)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        floor(col("l_quantity")).cast("long").as("qty_floor"),
        ceil(col("l_quantity")).cast("long").as("qty_ceil"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        abs(col("l_discount") - lit(0.05)).cast(MoneyDec).cast("double").as("disc_dev"),
        signum(col("l_discount") - lit(0.05)).cast("int").as("disc_sign"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val mathFuncsSql =
    """SELECT l_orderkey, l_linenumber,
      | ROUND(SQRT(l_extendedprice), 6) AS sqrt_price,
      | ROUND(LN(l_extendedprice), 6) AS ln_price,
      | CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
      | CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
      | POWER(l_quantity, 2) AS qty_sq,
      | CAST(CAST(ABS(l_discount - 0.05) AS DECIMAL(28,8)) AS DOUBLE) AS disc_dev,
      | CAST(SIGN(l_discount - 0.05) AS INT) AS disc_sign
      |FROM lineitem WHERE l_orderkey <= 500
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** B21 array functions over the embedding column (higher-order
    * transform/filter/aggregate stay inside codegen). */
  def arrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        round(aggregate(col("embedding").cast("array<double>"), lit(0.0), (a, x) => a + x), 6).as("vec_sum"),
        array_max(col("embedding")).cast("double").as("vec_max"),
        array_min(col("embedding")).cast("double").as("vec_min"),
        size(filter(col("embedding"), x => x > 0)).as("n_pos"))
      .orderBy(col("vec_id"))

  private val arrayFuncsSql =
    """SELECT vec_id, label,
      | CAST(len(embedding) AS INT) AS dim,
      | CAST(embedding[1] AS DOUBLE) AS first_val,
      | ROUND(list_sum([CAST(x AS DOUBLE) for x in embedding]), 6) AS vec_sum,
      | CAST(list_max(embedding) AS DOUBLE) AS vec_max,
      | CAST(list_min(embedding) AS DOUBLE) AS vec_min,
      | CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** B22 JSON extraction from events.props. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))

  private val jsonExtractSql =
    """SELECT event_type,
      | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      | COUNT(*) AS n,
      | COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** B23 subqueries (scalar + IN) through the SQL entry point —
    * Catalyst decorrelates both. */
  def subquerySql(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders_v
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS DOUBLE)/COUNT(*) * 1.5 FROM orders_v)
        |  AND o_custkey IN (SELECT c_custkey FROM customer_v WHERE c_acctbal > 0)
        |ORDER BY o_orderkey""".stripMargin)
  }

  private val subquerySqlSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_totalprice > (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE)/COUNT(*) * 1.5 FROM orders)
      |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
      |ORDER BY o_orderkey""".stripMargin

  /** B24 pivot with pinned values (single scan, no value discovery). */
  def pivotEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("view", "click", "signup", "purchase", "error"))
      .count()
      .select(col("user_id"),
        coalesce(col("view"), lit(0L)).as("n_view"),
        coalesce(col("click"), lit(0L)).as("n_click"),
        coalesce(col("signup"), lit(0L)).as("n_signup"),
        coalesce(col("purchase"), lit(0L)).as("n_purchase"),
        coalesce(col("error"), lit(0L)).as("n_error"))
      .orderBy(col("user_id"))

  private val pivotEventsSql =
    """SELECT user_id,
      | COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
      | COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
      | COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
      | COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      | COUNT(*) FILTER (WHERE event_type = 'error') AS n_error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** B10 statistical aggregates. Exact percentiles use linear
    * interpolation with the same (n-1)·q rank definition on both
    * engines; interpolated values of 4-decimal data at decile
    * fractions stay ≤5 decimals → the DECIMAL(28,8) recovery cast
    * makes them bit-exact cross-engine. stddev/corr round(4) — sqrt-based
    * irrational outputs, so the engines' ~1e-12 algorithmic differences
    * can't straddle a rounding boundary in practice. */
  def statsAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").cast(MoneyDec).cast("double").as("med_price"),
        expr("percentile(l_extendedprice, 0.9)").cast(MoneyDec).cast("double").as("p90_price"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val statsAggSql =
    """SELECT l_returnflag,
      | CAST(CAST(quantile_cont(l_extendedprice, 0.5) AS DECIMAL(28,8)) AS DOUBLE) AS med_price,
      | CAST(CAST(quantile_cont(l_extendedprice, 0.9) AS DECIMAL(28,8)) AS DOUBLE) AS p90_price,
      | ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
      | ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
      | COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** B22 map functions over parsed JSON (from_json → MapType). */
  def mapFuncs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, MapType, StringType}
    Tables.events(s, d)
      .withColumn("m", from_json(col("props"), MapType(StringType, LongType)))
      .select(col("event_id"),
        size(map_keys(col("m"))).as("n_keys"),
        array_join(sort_array(map_keys(col("m"))), ",").as("keys_csv"),
        element_at(col("m"), "k").as("k_val"))
      .orderBy(col("event_id"))
  }

  private val mapFuncsSql =
    """SELECT event_id,
      | CAST(len(json_keys(props)) AS INT) AS n_keys,
      | array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
      | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
      |FROM events ORDER BY event_id""".stripMargin

  /** B13 approx distinct (HLL++) — engine-specific estimate, so no SQL
    * oracle; exact count rides along for the ScalaTest bounds check. */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy(col("l_returnflag"))

  /** B37 TypedImperativeAggregate: the engine's own HLL sketch
    * (graft.functions.HllSketchAgg) next to the exact count it
    * estimates. Like q27, engine-specific estimator → no SQL oracle;
    * HllSketchSpec grades the error bound, the partitioning
    * independence, and the SQL registration. */
  def hllSketchDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(graft.functions.GraftFunctions.hllDistinct(col("l_partkey")).as("hll_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy(col("l_returnflag"))

  /** B10 arg-max/arg-min aggregates (max_by/min_by): the "which row
    * holds the extreme?" shape a pipeline uses to pick exemplar docs
    * per group without a window pass — one partial-aggregatable shuffle
    * on the group key, no row_number. The selector key is the
    * zero-padded string (n_chars, doc_id) — lexicographic = numeric
    * order for 12-digit padding (values < 1e12; no arithmetic, so no
    * overflow at any corpus size) and both engines resolve ties
    * identically on the unique doc_id suffix. */
  private def padKey(a: Column, b: Column): Column =
    concat(lpad(a.cast("string"), 12, "0"), lpad(b.cast("string"), 12, "0"))

  def argMaxByLang(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(
        max_by(col("doc_id"), padKey(col("n_chars"), col("doc_id"))).as("longest_doc"),
        min_by(col("doc_id"), padKey(col("n_chars"), col("doc_id"))).as("shortest_doc"),
        max(col("n_chars")).as("max_chars"),
        min(col("n_chars")).as("min_chars"))
      .orderBy(col("lang"))

  private val argMaxByLangSql =
    """SELECT lang,
      | max_by(doc_id, lpad(CAST(n_chars AS VARCHAR),12,'0') || lpad(CAST(doc_id AS VARCHAR),12,'0')) AS longest_doc,
      | min_by(doc_id, lpad(CAST(n_chars AS VARCHAR),12,'0') || lpad(CAST(doc_id AS VARCHAR),12,'0')) AS shortest_doc,
      | MAX(n_chars) AS max_chars, MIN(n_chars) AS min_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** B23 LATERAL correlated subquery (SQL): per-outer-row top-k — the
    * other decorrelation family next to q25's scalar/IN subqueries.
    * Catalyst plans the correlated ORDER BY+LIMIT as a domain join +
    * per-key window, so it stays a join, never a driver loop. */
  def lateralTopPerRegion(s: SparkSession, d: String): DataFrame = {
    Tables.region(s, d).createOrReplaceTempView("region_v")
    Tables.nation(s, d).createOrReplaceTempView("nation_lv")
    s.sql("""SELECT r.r_name, l.n_name FROM region_v r,
      LATERAL (SELECT n_name FROM nation_lv n WHERE n.n_regionkey = r.r_regionkey
               ORDER BY n_name LIMIT 2) l
      ORDER BY r_name, n_name""")
  }

  private val lateralTopPerRegionSql =
    """SELECT r.r_name, l.n_name FROM region r,
      | LATERAL (SELECT n_name FROM nation n WHERE n.n_regionkey = r.r_regionkey
      |          ORDER BY n_name LIMIT 2) l
      |ORDER BY r_name, n_name""".stripMargin

  /** B15 RANGE window frame: 7-day rolling revenue over per-day
    * aggregates. The daily pre-aggregate shrinks the fact table to one
    * row per day before the unpartitioned window — at 100 TB the window
    * input is still only ~365 rows/year, so the single-partition frame
    * scan is free; never run a RANGE frame over raw fact rows. Spark's
    * integer rangeBetween over a day ordinal is exactly DuckDB's
    * RANGE INTERVAL 6 DAY PRECEDING on the date. */
  def rollingRevenue(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate"))
      .agg(dsum(col("o_totalprice")).as("day_rev"))
    val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
    daily
      .withColumn("day_num", datediff(col("o_orderdate"), lit("1992-01-01").cast("date")))
      .withColumn("rev7", sum(col("day_rev").cast(MoneyDec)).over(w).cast("double"))
      .select(col("o_orderdate"), col("day_rev"), col("rev7"))
      .orderBy(col("o_orderdate"))
  }

  private val rollingRevenueSql =
    s"""WITH daily AS (SELECT o_orderdate, ${dsumSql("o_totalprice")} AS day_rev
       | FROM orders GROUP BY o_orderdate)
       |SELECT o_orderdate, day_rev,
       | CAST(CAST(SUM(CAST(day_rev AS DECIMAL(28,8))) OVER (ORDER BY o_orderdate
       |   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS rev7
       |FROM daily ORDER BY o_orderdate""".stripMargin

  /** B17 union-by-name: schema-aligned union of heterogenous branches
    * (different column orders, one branch missing a column → NULL).
    * This is the multi-source corpus merge shape — positional UNION
    * would silently cross-wire columns. */
  def unionByNameMerge(s: SparkSession, d: String): DataFrame = {
    val a = Tables.documents(s, d).groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .select(col("lang").as("k"), col("n"), lit("doc").as("src"), lit(1).as("flag"))
    val b = Tables.events(s, d).groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .select(lit("evt").as("src"), col("event_type").as("k"), col("n"))
    a.unionByName(b, allowMissingColumns = true).orderBy(col("src"), col("k"))
  }

  private val unionByNameMergeSql =
    """SELECT * FROM (
      | SELECT lang AS k, COUNT(*) AS n, 'doc' AS src, 1 AS flag FROM documents GROUP BY lang
      | UNION ALL BY NAME
      | SELECT 'evt' AS src, event_type AS k, COUNT(*) AS n FROM events GROUP BY event_type)
      |ORDER BY src, k""".stripMargin

  /** B24's inverse — unpivot/melt wide aggregates back to long form
    * (metric, value) rows. Narrow Expand operator: no shuffle beyond
    * the source aggregate; value columns must share a type, like SQL
    * UNPIVOT. */
  def unpivotStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(max(col("n_chars")).as("max_chars"),
        min(col("n_chars")).as("min_chars"),
        count(lit(1)).as("n_docs"))
      .unpivot(Array(col("lang")),
        Array(col("max_chars"), col("min_chars"), col("n_docs")),
        "metric", "value")
      .orderBy(col("lang"), col("metric"))

  private val unpivotStatsSql =
    """WITH wide AS (SELECT lang, MAX(n_chars) AS max_chars,
      |  MIN(n_chars) AS min_chars, COUNT(*) AS n_docs FROM documents GROUP BY lang)
      |SELECT * FROM (UNPIVOT wide ON max_chars, min_chars, n_docs
      |               INTO NAME metric VALUE value)
      |ORDER BY lang, metric""".stripMargin

  /** q193: z-order data-layout audit — the file-skipping arithmetic
    * behind Delta/Iceberg `OPTIMIZE ZORDER BY` and parquet min/max
    * pruning, measured inside the engine. Orders map to a 4096×4096
    * grid (x = days since 1992-01-01 — the corpus's earliest
    * orderdate, so every x is non-negative and the max ~2405 fits the
    * 4096 axis with no two's-complement wrap into phantom cells;
    * y = o_custkey mod 4096); three
    * writer layouts assign each row a "file":
    *   - `zorder`     — top 6 bits of the 24-bit Morton interleave,
    *     i.e. one file per quadtree cell (what a z-order writer's
    *     range partitioner converges to on a uniform grid);
    *   - `datesorted` — 64-day stripes (x >> 6), the single-column
    *     sort a naive time-partitioned writer produces;
    *   - `roundrobin` — o_orderkey mod 64, the no-layout baseline
    *     every unsorted ingest degenerates to.
    * For the canonical two-dimensional slice (order year 1996 AND
    * customer band y < 512 — the year bounds are day offsets FROM THE
    * SAME EPOCH, [1461, 1827), so the leap day 1996-12-31 is inside
    * the slice) the query reports, per layout, how many
    * files a min/max-pruning scanner opens, the rows it reads, and
    * the read amplification vs the true match count. The zorder
    * layout bounds BOTH dimensions per file; datesorted bounds only
    * x (scans every stripe of 1996 in full); roundrobin bounds
    * nothing (scans the corpus).
    *
    * Scale shape: one map-only projection (the 24-term Morton sum is
    * plain codegen'd integer arithmetic — no HOF, no UDF) + three
    * ≤64-group aggregates. No windows, no global sort: the file id
    * is a PURE FUNCTION of the row, so at 100 TB the audit is one
    * pass over footer-grain stats, exactly like the real pruning it
    * models. */
  def zorderLayout(s: SparkSession, d: String): DataFrame = {
    val pts = Tables.orders(s, d).select(
      col("o_orderkey").as("k"),
      datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).cast("long").as("x"),
      (col("o_custkey") % 4096).as("y"))
    val z = (0 until 12).map(i =>
      s"(shiftleft(cast(shiftright(x, $i) & 1 as bigint), ${2 * i}) + " +
        s"shiftleft(cast(shiftright(y, $i) & 1 as bigint), ${2 * i + 1}))").mkString(" + ")
    val graded = pts
      .withColumn("z", expr(z))
      .withColumn("matched",
        (col("x") >= 1461 && col("x") < 1827 && col("y") < 512).cast("long"))
    def layout(name: String, fileCol: Column): DataFrame =
      graded.groupBy(fileCol.as("f"))
        .agg(min(col("x")).as("xlo"), max(col("x")).as("xhi"),
          min(col("y")).as("ylo"), max(col("y")).as("yhi"),
          count(lit(1)).as("nrows"), sum(col("matched")).as("m"))
        .withColumn("scanned",
          (col("xlo") < 1827 && col("xhi") >= 1461 && col("ylo") < 512).cast("long"))
        .agg(
          count(lit(1)).as("files_total"),
          sum(col("scanned")).as("files_scanned"),
          sum(col("scanned") * col("nrows")).as("rows_scanned"),
          sum(col("m")).as("rows_matched"))
        .select(lit(name).as("layout"), col("files_total"),
          col("files_scanned"), col("rows_scanned"), col("rows_matched"),
          round(col("rows_scanned").cast("double") /
            col("rows_matched").cast("double"), 4).as("read_amp"))
    layout("zorder", shiftright(col("z"), 18))
      .unionAll(layout("datesorted", shiftright(col("x"), 6)))
      .unionAll(layout("roundrobin", col("k") % 64))
      .orderBy(col("layout"))
  }

  private lazy val zorderLayoutSql = {
    val z = (0 until 12).map(i =>
      s"((CAST((x >> $i) & 1 AS BIGINT) << ${2 * i}) + " +
        s"(CAST((y >> $i) & 1 AS BIGINT) << ${2 * i + 1}))").mkString(" + ")
    def layout(name: String, fileExpr: String) =
      s"""SELECT '$name' AS layout,
         |       CAST(COUNT(*) AS BIGINT) AS files_total,
         |       CAST(SUM(scanned) AS BIGINT) AS files_scanned,
         |       CAST(SUM(scanned * nrows) AS BIGINT) AS rows_scanned,
         |       CAST(SUM(m) AS BIGINT) AS rows_matched,
         |       ROUND(CAST(SUM(scanned * nrows) AS DOUBLE) /
         |             CAST(SUM(m) AS DOUBLE), 4) AS read_amp
         |FROM (SELECT $fileExpr AS f,
         |        CASE WHEN MIN(x) < 1827 AND MAX(x) >= 1461 AND MIN(y) < 512
         |             THEN 1 ELSE 0 END AS scanned,
         |        COUNT(*) AS nrows, SUM(matched) AS m
         |      FROM graded GROUP BY 1)""".stripMargin
    s"""WITH pts AS (SELECT o_orderkey AS k,
       |        CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
       |        o_custkey % 4096 AS y
       |      FROM orders),
       |graded AS (SELECT k, x, y, $z AS z,
       |        CASE WHEN x >= 1461 AND x < 1827 AND y < 512 THEN 1 ELSE 0 END AS matched
       |      FROM pts)
       |${layout("zorder", "z >> 18")}
       |UNION ALL
       |${layout("datesorted", "x >> 6")}
       |UNION ALL
       |${layout("roundrobin", "k % 64")}
       |ORDER BY layout""".stripMargin
  }

  /** q211: SHARD REBALANCE audit — mod-hash vs rendezvous (HRW)
    * placement when the shard count grows 16 → 17, the decision every
    * 100 TB storage layer faces: mod-hashing moves ~16/17 of ALL keys
    * on a single-shard expansion (every key whose id mod 16 ≠ id mod
    * 17 — a full-corpus reshuffle), while highest-random-weight
    * placement (owner = argmax_j md5(key:j), Thaler/Ravishankar '96 —
    * the scheme inside Ceph CRUSH and many shard routers) moves
    * exactly the keys the NEW shard wins, E[1/17]. Both owners are
    * computed MAP-ONLY (array_max over a 16/17-element transform — no
    * explode, no window, no shuffle until the single 17-group
    * aggregate), and the argmax is a lexicographic max over md5 hex
    * strings — no float anywhere, so both engines agree on every
    * single owner.
    *
    * Output: per method, keys moved + the moved fraction, plus the
    * max post-expansion shard population (the balance check: HRW
    * stays ~uniform; mod stays uniform too but only by moving nearly
    * everything). */
  def shardRebalance(s: SparkSession, d: String): DataFrame = {
    def hrwOwner(m: Int): Column = expr(
      s"array_max(transform(sequence(0, ${m - 1}), " +
        "j -> struct(md5(concat(cast(doc_id as string), ':', j)) AS h, j AS j))).j")
    val owners = Tables.documents(s, d).select(
      col("doc_id"),
      (col("doc_id") % 16).as("mod16"), (col("doc_id") % 17).as("mod17"),
      hrwOwner(16).as("hrw16"), hrwOwner(17).as("hrw17"))
    // ONE pass over the corpus (ADVICE_r15: the two per-method reports
    // plus the population scan evaluated the owners projection — 33
    // md5s per key — three times). Grouping by the post-expansion HRW
    // owner folds everything into a single 17-group aggregate carrying
    // BOTH methods' moved counters and the shard population; the 2-row
    // report is a map-only explode over the 1-row rollup.
    owners.groupBy(col("hrw17")).agg(
        count(lit(1)).as("c"),
        sum(when(col("hrw16") =!= col("hrw17"), 1L).otherwise(0L)).as("hrw_mv"),
        sum(when(col("mod16") =!= col("mod17"), 1L).otherwise(0L)).as("mod_mv"))
      .agg(sum(col("c")).as("n_keys"), sum(col("hrw_mv")).as("hrw_moved"),
        sum(col("mod_mv")).as("mod_moved"), max(col("c")).as("max_shard"))
      .select(explode(array(
          struct(lit("hrw").as("method"), col("hrw_moved").as("n_moved")),
          struct(lit("mod").as("method"), col("mod_moved").as("n_moved")))).as("m"),
        col("n_keys"), col("max_shard"))
      .select(col("m.method").as("method"), col("n_keys"),
        col("m.n_moved").as("n_moved"),
        round(col("m.n_moved").cast("double") / col("n_keys"), 6).as("moved_frac"),
        col("max_shard"))
      .orderBy(col("method"))
  }

  private val shardRebalanceSql = {
    def hrw(m: Int) =
      s"(list_sort([{'h': md5(doc_id||':'||j), 'j': j} for j in generate_series(0, ${m - 1})]))[$m].j"
    s"""WITH o AS (SELECT doc_id, doc_id % 16 AS mod16, doc_id % 17 AS mod17,
       |    ${hrw(16)} AS hrw16, ${hrw(17)} AS hrw17
       |  FROM documents),
       |pop AS (SELECT MAX(c) AS max_shard FROM
       |  (SELECT hrw17, COUNT(*) AS c FROM o GROUP BY hrw17)),
       |rep AS (
       |  SELECT 'hrw' AS method, CAST(COUNT(*) AS BIGINT) AS n_keys,
       |         CAST(SUM(CASE WHEN hrw16 <> hrw17 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
       |  FROM o
       |  UNION ALL
       |  SELECT 'mod' AS method, CAST(COUNT(*) AS BIGINT) AS n_keys,
       |         CAST(SUM(CASE WHEN mod16 <> mod17 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
       |  FROM o)
       |SELECT method, n_keys, n_moved,
       |       ROUND(CAST(n_moved AS DOUBLE) / n_keys, 6) AS moved_frac,
       |       CAST(pop.max_shard AS BIGINT) AS max_shard
       |FROM rep, pop ORDER BY method""".stripMargin
  }

  /** q202: RANGE-PARTITION split planning — the other half of the
    * q193 layout story: before a sort/range write can skip files, a
    * writer must pick split points, and THE failure mode at 100 TB is
    * fixed-width ranges over a non-uniform key (a mirrored/sharded id
    * space concentrates whole copies into a handful of partitions
    * while most stay empty). Both schemes audited side by side over
    * 16 target partitions of lineitem by l_orderkey:
    *   - `fixedwidth` — min + j·(max−min)/16, the zero-information
    *     default;
    *   - `equidepth`  — the 15 interior quantiles, what Spark's own
    *     RangePartitioner estimates by sampling, computed exactly.
    * Per (scheme, partition): row count. The p=j/16 quantiles of an
    * integer key are EXACT in double arithmetic (power-of-two
    * denominators: every product in the interpolation stays under
    * 2^53), so the splits — and therefore the counts — are
    * bit-identical cross-engine with no rounding step at all.
    *
    * The quantiles come from a FIXED-SIZE deterministic reservoir:
    * the 4096 rows with the smallest md5 — a TakeOrderedAndProject
    * cut, so the percentile buffer is 4096 keys AT ANY CORPUS SIZE
    * (and below 4096 rows the sample IS the table, exact splits).
    * This replaced two drafts measured at the 100× corpus: exact
    * full-column quantiles (80 s — a single-group exact percentile
    * buffers every key in one aggregation state, the textbook
    * unbounded-state trap) and a fractional md5 sample (a rate small
    * enough for 1000× starves the graded SFs: 1/256 left ~230 sample
    * rows at sf0.01 and the "equi-depth" audit read 4× skew from its
    * own split noise). A fixed-size rank-sample is what Spark's own
    * RangePartitioner reservoir does per partition — made replayable
    * here by ranking on a hash instead of a RNG. DKW bounds the split
    * error near 1.3/64 ≈ 2% quantile mass at full reservoir.
    *
    * Scale shape: one scan-side top-4096 cut → one bounded percentile
    * aggregate, broadcast to a map-only 15-comparison assignment,
    * then a 32-group count. */
  def rangeSplits(s: SparkSession, d: String): DataFrame = {
    val ps = (1 to 15).map(j => j / 16.0)
    val sample = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        md5(concat_ws(":", lit("rs"), col("l_orderkey"), col("l_linenumber")))
          .as("h"))
      .orderBy(col("h")).limit(4096)
    val splits = sample.agg(
      expr(s"percentile(l_orderkey, array(${ps.mkString(",")}))").as("q"))
      .crossJoin(Tables.lineitem(s, d).agg(
        min(col("l_orderkey")).as("klo"), max(col("l_orderkey")).as("khi")))
    val assigned = Tables.lineitem(s, d).select(col("l_orderkey").as("k"))
      .crossJoin(broadcast(splits))
    def pid(splitExpr: Int => Column): Column =
      (1 to 15).map(j => when(col("k") > splitExpr(j), 1L).otherwise(0L))
        .reduce(_ + _)
    // BOTH schemes' partition ids from ONE fact scan (r16, guide §2.4):
    // the unionAll of two projections of `assigned` planned as two
    // full lineitem scans + crossJoins; a 2-way explode per row feeds
    // the same ≤32-group map-side-combined aggregate with half the
    // scan/comparison work. Same (scheme, p_id) multiset — hash-
    // verified tri-SF.
    assigned
      .select(explode(array(
        struct(lit("equidepth").as("scheme"),
          pid(j => col("q").getItem(j - 1)).as("p_id")),
        struct(lit("fixedwidth").as("scheme"),
          pid(j => col("klo") +
            (col("khi") - col("klo")).cast("double") * (j / 16.0)).as("p_id"))))
        .as("x"))
      .groupBy(col("x.scheme").as("scheme"), col("x.p_id").as("p_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("scheme"), col("p_id"))
  }

  private lazy val rangeSplitsSql = {
    val ps = (1 to 15).map(j => j / 16.0).mkString(", ")
    val eqPid = (1 to 15).map(j =>
      s"CASE WHEN k > q[$j] THEN 1 ELSE 0 END").mkString(" + ")
    val fwPid = (1 to 15).map(j =>
      s"CASE WHEN k > klo + CAST(khi - klo AS DOUBLE) * (${j / 16.0}) THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH smp AS (SELECT l_orderkey
       |      FROM (SELECT l_orderkey,
       |              md5('rs:' || CAST(l_orderkey AS VARCHAR)
       |                || ':' || CAST(l_linenumber AS VARCHAR)) AS h
       |            FROM lineitem ORDER BY h LIMIT 4096)),
       |sp AS (SELECT quantile_cont(l_orderkey, [$ps]) AS q FROM smp),
       |mm AS (SELECT MIN(l_orderkey) AS klo, MAX(l_orderkey) AS khi FROM lineitem),
       |a AS (SELECT l_orderkey AS k, q, klo, khi FROM lineitem, sp, mm),
       |u AS (SELECT 'equidepth' AS scheme, CAST($eqPid AS BIGINT) AS p_id FROM a
       |      UNION ALL
       |      SELECT 'fixedwidth' AS scheme, CAST($fwPid AS BIGINT) AS p_id FROM a)
       |SELECT scheme, p_id, CAST(COUNT(*) AS BIGINT) AS n
       |FROM u GROUP BY scheme, p_id ORDER BY scheme, p_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q211_shard_rebalance", shardRebalance, Some(shardRebalanceSql),
      "shard rebalance audit 16->17: mod-hash moves ~16/17 of keys, rendezvous (HRW) moves ~1/17"),
    QueryDef("q202_range_splits", rangeSplits, Some(rangeSplitsSql),
      "range-partition planning: exact equi-depth quantile splits vs fixed-width, per-partition counts"),
    QueryDef("q193_zorder_layout", zorderLayout, Some(zorderLayoutSql),
      "z-order vs date-sorted vs round-robin layout: file-skipping + read amplification audit"),
    QueryDef("q01_pricing_summary", pricingSummary, Some(pricingSummarySql), "B10 hash aggregate"),
    QueryDef("q71_unpivot", unpivotStats, Some(unpivotStatsSql), "B24 unpivot/melt"),
    QueryDef("q02_filter_scan", filterScan, Some(filterScanSql), "B1/B2 scan + predicates"),
    QueryDef("q03_project_case", projectCase, Some(projectCaseSql), "B3 projection + CASE"),
    QueryDef("q04_revenue_by_nation", revenueByNation, Some(revenueByNationSql), "B4 broadcast star join"),
    QueryDef("q05_join_large", joinLarge, Some(joinLargeSql), "B5 shuffle join"),
    QueryDef("q49_shipping_priority", shippingPriority, Some(shippingPrioritySql), "Q3-shape join+agg+topk"),
    QueryDef("q56_forecast_revenue", forecastRevenue, Some(forecastRevenueSql), "Q6-shape scan-agg"),
    QueryDef("q06_left_join", leftJoinOrders, Some(leftJoinOrdersSql), "B6 left outer join"),
    QueryDef("q07_full_outer", fullOuterNation, Some(fullOuterNationSql), "B6 full outer join"),
    QueryDef("q08_anti_join", antiJoin, Some(antiJoinSql), "B7 anti join"),
    QueryDef("q09_semi_join", semiJoin, Some(semiJoinSql), "B7 semi join"),
    QueryDef("q10_range_band_join", rangeBandJoin, Some(rangeBandJoinSql), "B8 range/theta join"),
    QueryDef("q11_asof_join", asofJoin, Some(asofJoinSql), "B9 as-of join"),
    QueryDef("q12_rollup", rollupAgg, Some(rollupAggSql), "B11 rollup"),
    QueryDef("q13_cube", cubeAgg, Some(cubeAggSql), "B11 cube"),
    QueryDef("q14_distinct", distinctPairs, Some(distinctPairsSql), "B12 distinct"),
    QueryDef("q48_grouping_sets", groupingSets, Some(groupingSetsSql), "B11 grouping sets"),
    QueryDef("q15_window_rank", windowRank, Some(windowRankSql), "B14 ranking window"),
    QueryDef("q16_window_running", windowRunning, Some(windowRunningSql), "B15 analytic window"),
    QueryDef("q17_topk", topkOrders, Some(topkOrdersSql), "B16 top-k"),
    QueryDef("q18_set_ops", setOps, Some(setOpsSql), "B17 set operations"),
    QueryDef("q47_set_ops_bag", setOpsBag, Some(setOpsBagSql), "B17 bag set operations"),
    QueryDef("q19_string_funcs", stringFuncs, Some(stringFuncsSql), "B18 string functions"),
    QueryDef("q20_date_parts", dateParts, Some(datePartsSql), "B19 date functions"),
    QueryDef("q21_ship_delay", shipDelay, Some(shipDelaySql), "B19 datediff"),
    QueryDef("q22_math_funcs", mathFuncs, Some(mathFuncsSql), "B20 math functions"),
    QueryDef("q23_array_funcs", arrayFuncs, Some(arrayFuncsSql), "B21 array functions"),
    QueryDef("q24_json_extract", jsonExtract, Some(jsonExtractSql), "B22 JSON functions"),
    QueryDef("q25_subquery", subquerySql, Some(subquerySqlSql), "B23 subqueries"),
    QueryDef("q26_pivot", pivotEvents, Some(pivotEventsSql), "B24 pivot"),
    QueryDef("q44_map_funcs", mapFuncs, Some(mapFuncsSql), "B22 map functions"),
    QueryDef("q46_stats_agg", statsAgg, Some(statsAggSql), "B10 percentiles/stddev/corr"),
    QueryDef("q63_arg_max", argMaxByLang, Some(argMaxByLangSql), "B10 max_by/min_by"),
    QueryDef("q64_lateral_topk", lateralTopPerRegion, Some(lateralTopPerRegionSql), "B23 LATERAL subquery"),
    QueryDef("q65_rolling_revenue", rollingRevenue, Some(rollingRevenueSql), "B15 RANGE window frame"),
    QueryDef("q66_union_by_name", unionByNameMerge, Some(unionByNameMergeSql), "B17 union-by-name"),
    QueryDef("q27_approx_distinct", approxDistinct, None, "B13 approx distinct (non-oracle)"),
    QueryDef("q78_hll_sketch", hllSketchDistinct, None, "B37 TypedImperativeAggregate HLL sketch (non-oracle)"))
}
