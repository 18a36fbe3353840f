package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions._

/** Time-window operator surface — SURVEY.md §2.B38–B40.
  *
  * These run in BATCH here (that is what the t2 gate grades) but use
  * the exact window operators Structured Streaming executes —
  * `window()` / `session_window()` — so the same plans run unchanged
  * under `readStream` with a watermark (graft.streaming.StreamingOps
  * wires them to streams; ScalaTest covers B41/B42 semantics there).
  * At 100 TB the streaming form is the incremental-import story for a
  * continuously-updated dump: watermarked event-time windows, state in
  * the state store, no reprocessing.
  */
object WindowedOps {

  /** B38 tumbling 1-hour window (epoch-aligned ⇒ oracle is date_trunc). */
  def tumblingHourly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("total_value"))
      .orderBy(col("wstart"), col("event_type"))

  private val tumblingHourlySql =
    s"""SELECT date_trunc('hour', ts) AS wstart, event_type, COUNT(*) AS n,
       | ${dsumSql("value")} AS total_value
       |FROM events GROUP BY wstart, event_type
       |ORDER BY wstart, event_type""".stripMargin

  /** B39 sliding window: 1 hour every 15 minutes. Spark emits only
    * windows containing events; the oracle's inner join to the slide
    * grid reproduces exactly that. The grid bounds derive from the
    * data's own ts range (date_trunc('hour', min) is epoch-aligned, so
    * 15-minute steps stay slide-aligned; slots past max(ts) are empty
    * and drop out of the inner join), so the oracle holds at any scale
    * factor's time span. */
  def slidingQuarter(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("ws"), col("n"), col("total_value"))
      .orderBy(col("ws"))

  private val slidingQuarterSql =
    s"""SELECT ws, COUNT(*) AS n, ${dsumSql("value")} AS total_value
       |FROM events
       |JOIN (SELECT unnest(generate_series(
       |        (SELECT date_trunc('hour', min(ts)) - INTERVAL 45 MINUTE FROM events),
       |        (SELECT max(ts) FROM events),
       |        INTERVAL 15 MINUTE)) AS ws) grid
       |  ON ts >= ws AND ts < ws + INTERVAL 1 HOUR
       |GROUP BY ws ORDER BY ws""".stripMargin

  /** B40 session windows: 30-minute inactivity gap per user.
    * session_window end = last event + gap (Spark semantics); the
    * oracle is the classic gaps-and-islands rewrite. */
  def sessionWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_start"))

  private val sessionWindowsSql =
    s"""WITH e AS (SELECT user_id, ts, event_id, value,
       |  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |            > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
       | FROM events),
       |sid AS (SELECT user_id, ts, value,
       |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       | FROM e)
       |SELECT user_id, MIN(ts) AS session_start,
       |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       |       COUNT(*) AS n_events, ${dsumSql("value")} AS session_value
       |FROM sid GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  /** Sequence/funnel analytics: users whose ordered event path matches
    * view→…→click→…→purchase. One shuffle on user_id; the per-user
    * path is built from a sorted struct collect (ts, event_id tiebreak
    * ⇒ total order, so collect_list's partition nondeterminism washes
    * out) and matched with a portable regex. At 100 TB per-user state
    * is bounded by events-per-user, the same bound the streaming
    * session operators rely on. */
  def funnelUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .filter(col("path").rlike("view.*click.*purchase"))
      .select(col("user_id"), col("n_events"))
      .orderBy(col("user_id"))

  private val funnelUsersSql =
    """SELECT user_id, COUNT(*) AS n_events
      |FROM events GROUP BY user_id
      |HAVING regexp_matches(string_agg(event_type, '>' ORDER BY ts, event_id),
      |                      'view.*click.*purchase')
      |ORDER BY user_id""".stripMargin

  /** Retention curve: distinct users active N days after their first
    * event. The per-user first-day is a window min (one shuffle on
    * user_id), then a distinct count per day-offset — the standard
    * cohort/retention pattern over an events fact table. */
  def retentionCurve(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, d)
      .withColumn("day", date_trunc("day", col("ts")))
      .withColumn("day0", min(col("day")).over(w))
      .groupBy(datediff(col("day"), col("day0")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("day_offset"))
  }

  private val retentionCurveSql =
    """WITH e AS (SELECT user_id, date_trunc('day', ts) AS d,
      |  MIN(date_trunc('day', ts)) OVER (PARTITION BY user_id) AS d0 FROM events)
      |SELECT date_diff('day', d0, d) AS day_offset, COUNT(DISTINCT user_id) AS n_users
      |FROM e GROUP BY day_offset ORDER BY day_offset""".stripMargin

  /** Batch twin of the stream-stream interval join (StreamingSpec
    * drives the same shape under readStream with watermarks):
    * purchase↔view attribution within a 2-hour lookback. The equi key
    * (user_id) carries the shuffle; the time band is a residual
    * predicate on co-partitioned rows — never a cross join. */
  def intervalJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("vuid"), col("ts").as("vts"))
    p.join(v, col("user_id") === col("vuid") &&
        col("vts") <= col("pts") && col("vts") > col("pts") - expr("INTERVAL 2 HOURS"))
      .select(col("purchase_id"), col("view_id"),
        (unix_timestamp(col("pts")) - unix_timestamp(col("vts"))).as("gap_s"))
      .orderBy(col("purchase_id"), col("view_id"))
  }

  private val intervalJoinSql =
    """SELECT p.event_id AS purchase_id, v.event_id AS view_id,
      | CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS gap_s
      |FROM (SELECT * FROM events WHERE event_type='purchase') p
      |JOIN (SELECT * FROM events WHERE event_type='view') v
      |  ON p.user_id = v.user_id AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 2 HOUR
      |ORDER BY purchase_id, view_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q60_tumbling_hourly", tumblingHourly, Some(tumblingHourlySql), "B38 tumbling window"),
    QueryDef("q77_interval_join", intervalJoin, Some(intervalJoinSql), "interval join (batch twin of stream-stream join)"),
    QueryDef("q68_funnel_path", funnelUsers, Some(funnelUsersSql), "sequence/funnel analytics"),
    QueryDef("q72_retention_curve", retentionCurve, Some(retentionCurveSql), "cohort/retention analytics"),
    QueryDef("q61_sliding_quarter", slidingQuarter, Some(slidingQuarterSql), "B39 sliding window"),
    QueryDef("q62_session_windows", sessionWindows, Some(sessionWindowsSql), "B40 session window"))
}
