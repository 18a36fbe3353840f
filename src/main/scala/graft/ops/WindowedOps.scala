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

  /** q111: gap-fill / resample — densify each sampled user's event
    * series onto a regular hourly grid and forward-fill the last
    * observed value into the holes (the time-series preprocessing
    * step before any windowed model sees the data: models want
    * regular grids, events arrive irregularly).
    *
    * Shape: hour-grain arg-max pick (row_number over (user, hour) —
    * deterministic (ts, event_id) tie-break, replayed identically in
    * SQL rather than trusting cross-engine max_by struct semantics),
    * a 1-row global span broadcast under the sequence() explode (the
    * grid is generated, never stored), and ONE user-partitioned
    * ordered window for the forward fill (`last(v, ignoreNulls)` over
    * unbounded preceding). At scale the grid is rows × hours but
    * every stage is user-partitioned — no global sort, no self-join;
    * the filled value is the raw event double passed through
    * untouched (no FP arithmetic to diverge on). */
  def gapfillResample(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("user_id") % 10 === 0)
      .withColumn("hour", date_trunc("hour", col("ts")))
    val pick = Window.partitionBy(col("user_id"), col("hour"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val hourly = ev
      .withColumn("rk", row_number().over(pick))
      .withColumn("n_events",
        count(lit(1)).over(Window.partitionBy(col("user_id"), col("hour"))))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("hour"), col("value").as("v"), col("n_events"))
    val span = ev.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val grid = hourly.select(col("user_id")).distinct()
      .crossJoin(broadcast(span))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val fill = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(fill))
      .withColumn("is_gap", col("v").isNull)
      .filter(col("filled").isNotNull)
      .select(col("user_id"), col("hour"), col("filled"), col("is_gap"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("user_id"), col("hour"))
  }

  private val gapfillResampleSql =
    """WITH ev AS (SELECT user_id, date_trunc('hour', ts) AS hour, ts, event_id, value
      |           FROM events WHERE user_id % 10 = 0),
      |ranked AS (SELECT user_id, hour, value,
      |             ROW_NUMBER() OVER (PARTITION BY user_id, hour
      |                                ORDER BY ts DESC, event_id DESC) AS rk,
      |             COUNT(*) OVER (PARTITION BY user_id, hour) AS n_events
      |           FROM ev),
      |hourly AS (SELECT user_id, hour, value AS v, n_events FROM ranked WHERE rk = 1),
      |span AS (SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM ev),
      |grid AS (SELECT u.user_id, g.hour
      |         FROM (SELECT DISTINCT user_id FROM hourly) u,
      |              (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      |               FROM span) g),
      |joined AS (SELECT gr.user_id, gr.hour, h.v, COALESCE(h.n_events, 0) AS n_events
      |           FROM grid gr LEFT JOIN hourly h
      |             ON h.user_id = gr.user_id AND h.hour = gr.hour),
      |filled AS (SELECT user_id, hour,
      |             LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
      |             v IS NULL AS is_gap, n_events
      |           FROM joined)
      |SELECT user_id, hour, filled, is_gap, CAST(n_events AS BIGINT) AS n_events
      |FROM filled WHERE filled IS NOT NULL
      |ORDER BY user_id, hour""".stripMargin

  /** q184: SCD TYPE-2 interval build — the warehouse dimension-history
    * op: per user, CONSECUTIVE runs of the tracked attribute
    * (event_type) collapse into validity intervals
    * [valid_from, valid_to) with the open current row last.
    * Gaps-and-islands: lag() marks run starts, a running sum numbers
    * the islands, one grouped aggregate takes each run's first ts and
    * size, lead() closes each interval with the next run's opening
    * edge. The 1-in-10 user slice bounds the graded output; the
    * operator is the full dimension build.
    *
    * Scale shape: every window and the aggregate partition on
    * user_id — high-cardinality, skew-free, no cross-user traffic;
    * this is one shuffle on the dimension key however large the
    * event log. */
  def scd2Intervals(s: SparkSession, d: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val runs = Tables.events(s, d)
      .filter(col("user_id") % 10 === 3)
      .withColumn("prev", lag(col("event_type"), 1).over(byTs))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val byRun = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    runs.groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("user_id"), col("event_type").as("attr"),
        col("valid_from"), col("valid_to"), col("n_events"), col("is_current"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  private val scd2IntervalsSql =
    """WITH e AS (SELECT user_id, event_id, ts, event_type FROM events
      |           WHERE user_id % 10 = 3),
      |c AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |             OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |r AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id FROM c),
      |g AS (SELECT user_id, run_id, event_type, MIN(ts) AS valid_from,
      |        COUNT(*) AS n_events
      |      FROM r GROUP BY user_id, run_id, event_type)
      |SELECT user_id, event_type AS attr, valid_from,
      |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to,
      |       n_events,
      |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) IS NULL
      |         AS is_current
      |FROM g ORDER BY user_id, valid_from""".stripMargin

  /** q187: POINT-IN-TIME feature join — the feature-store op that
    * keeps training data leakage-free: every event reads the profile
    * state (here: the value-bucket set by the user's most recent
    * PRECEDING signup) as of ITS OWN timestamp; events before a
    * user's first signup get null, never a future value. Implemented
    * as the scalable union-and-fill shape, not an event×state range
    * join: state-change rows and probe rows merge in ONE user-keyed
    * sort and a running last_value(ignoreNulls) carries the state
    * forward — the q111 gap-fill pattern pointed at dimension
    * lookups. Boundary-before-probe at equal timestamps makes a
    * same-instant signup visible to its own event (the documented
    * inclusive edge). Same 1-in-10 user slice as q184.
    *
    * Scale shape: one shuffle on user_id however large the log;
    * per-user state is a single running value — no interval table is
    * ever materialized or range-joined. */
  def pitFeatures(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id") % 10 === 3)
    // floor before the int cast: Spark CAST(double AS int) truncates
    // while DuckDB rounds — floor makes both exact
    val dim = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        (floor(col("value")).cast("int") % 5).as("attr"),
        col("event_id"), lit(0).as("is_evt"))
    val probes = ev.select(col("user_id"), col("ts"),
      lit(null).cast("int").as("attr"), col("event_id"), lit(1).as("is_evt"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_evt"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dim.unionByName(probes)
      .withColumn("attr_at", last(col("attr"), ignoreNulls = true).over(w))
      .filter(col("is_evt") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("attr_at"))
      .orderBy(col("event_id"))
  }

  private val pitFeaturesSql =
    """WITH ev AS (SELECT * FROM events WHERE user_id % 10 = 3),
      |dim AS (SELECT user_id, ts, CAST(floor(value) AS INT) % 5 AS attr,
      |          event_id, 0 AS is_evt
      |        FROM ev WHERE event_type = 'signup'),
      |pr AS (SELECT user_id, ts, CAST(NULL AS INT) AS attr,
      |         event_id, 1 AS is_evt FROM ev),
      |u AS (SELECT * FROM dim UNION ALL SELECT * FROM pr),
      |f AS (SELECT user_id, ts, event_id, is_evt,
      |        LAST_VALUE(attr IGNORE NULLS) OVER (PARTITION BY user_id
      |          ORDER BY ts, is_evt, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr_at
      |      FROM u)
      |SELECT event_id, user_id, ts, attr_at FROM f WHERE is_evt = 1
      |ORDER BY event_id""".stripMargin

  /** q194: last-touch attribution — the event-analytics op every
    * product/marketing warehouse runs nightly: each purchase is
    * credited to the most recent preceding touch event (click / view /
    * signup) by the same user, demoted to 'direct' when no touch
    * exists or the touch is older than the 7-day lookback. Revenue and
    * time-to-convert then aggregate per channel.
    *
    * The lookback is applied AFTER picking the last touch (a plain
    * ROWS frame + one CASE), not as a RANGE frame — same answer for
    * last-touch semantics, and the ROWS frame is the shape the
    * streaming twin keeps as one value of per-user state
    * (mapGroupsWithState: latest touch (ts, type) per user — 16 bytes
    * — vs a RANGE frame's unbounded event buffer).
    *
    * The two `last(when(touch, X), ignoreNulls)` columns read ts and
    * type from the SAME row because their CASE nulls coincide — no
    * struct packing, no self-join. Scale shape: ONE shuffle on
    * user_id feeds the window; the channel aggregate is 4 groups with
    * map-side combine; ties on ts break by event_id in both engines. */
  def lastTouchAttribution(s: SparkSession, d: String): DataFrame = {
    val touch = col("event_type").isin("click", "view", "signup")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val purchases = Tables.events(s, d)
      .withColumn("touch_ts", last(when(touch, col("ts")), ignoreNulls = true).over(w))
      .withColumn("touch_type", last(when(touch, col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("delay_s",
        round((unix_micros(col("ts")) - unix_micros(col("touch_ts"))).cast("double")
          / 1000000.0, 4))
      .withColumn("channel",
        when(col("touch_ts").isNull || col("delay_s") > 7 * 86400, "direct")
          .otherwise(col("touch_type")))
      .withColumn("attr_delay_s", when(col("channel") =!= "direct", col("delay_s")))
    purchases.groupBy(col("channel"))
      .agg(
        count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_buyers"),
        dsum(col("value")).as("total_value"),
        when(count(col("attr_delay_s")) > 0,
          round(davg(col("attr_delay_s")), 4)).as("avg_delay_s"))
      .orderBy(col("channel"))
  }

  private lazy val lastTouchAttributionSql =
    s"""WITH t AS (SELECT *,
       |    last_value(CASE WHEN event_type IN ('click','view','signup') THEN ts END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_ts,
       |    last_value(CASE WHEN event_type IN ('click','view','signup') THEN event_type END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type
       |  FROM events),
       |p AS (SELECT *,
       |    ROUND(CAST(epoch_us(ts) - epoch_us(touch_ts) AS DOUBLE) / 1000000.0, 4) AS delay_s
       |  FROM t WHERE event_type = 'purchase'),
       |c AS (SELECT *,
       |    CASE WHEN touch_ts IS NULL OR delay_s > ${7 * 86400} THEN 'direct'
       |         ELSE touch_type END AS channel
       |  FROM p)
       |SELECT channel,
       |       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers,
       |       ${dsumSql("value")} AS total_value,
       |       CASE WHEN COUNT(CASE WHEN channel <> 'direct' THEN delay_s END) > 0
       |            THEN ROUND(${davgSql("CASE WHEN channel <> 'direct' THEN delay_s END")}, 4)
       |            ELSE NULL END AS avg_delay_s
       |FROM c GROUP BY channel ORDER BY channel""".stripMargin

  /** q198: MAX CONCURRENCY per hour — the sweep-line interval
    * analytic (peak concurrent sessions, the capacity-planning number
    * every ops dashboard carries), built as a DISTRIBUTED prefix sum:
    * the textbook solution is one global running sum over every
    * interval endpoint, i.e. a single-partition sort of the corpus —
    * the exact shape the plan guards forbid. The scalable
    * decomposition: each event opens a 30-minute session (+1 at ts,
    * −1 at ts+30min); (1) per-hour net sums aggregate map-side;
    * (2) ONE bounded global window over the HOUR GRAIN (corpus
    * span / 3600 rows — q65's documented pre-aggregated-grain
    * exception) turns nets into each hour's starting concurrency;
    * (3) a within-hour running sum partitioned BY hour adds the local
    * prefix. peak(hour) = base + max(0, local prefix max): the
    * `greatest(0, …)` covers the all-ends hour whose peak stands at
    * its opening concurrency. At equal timestamps ends sort before
    * starts (−1 < +1), the [a, b) convention — and within an equal
    * (t, delta) group any order yields the same running extrema, so
    * the peak is deterministic without a per-row tiebreak.
    *
    * Scale shape: one map-side explode to ±1 deltas, one hour-keyed
    * shuffle for phases 1+3, and a ≤|hours|-row global pass — the
    * generic recipe for ANY running-total analytic at 100 TB
    * (cumulative revenue, live-user curves, storage watermarks). */
  /** q198's ±1 session-endpoint deltas — shared VERBATIM with the
    * streaming twin (StreamingOps.concurrencyHourlyNets), so the
    * online hourly nets and the batch sweep can never drift. */
  private[graft] def concurrencyDeltas(events: DataFrame): DataFrame =
    events
      .select(explode(array(
        struct(col("ts").as("t"), lit(1L).as("delta")),
        struct((col("ts") + expr("INTERVAL 30 MINUTES")).as("t"),
          lit(-1L).as("delta")))).as("e"))
      .select(col("e.t").as("t"), col("e.delta").as("delta"))

  def maxConcurrency(s: SparkSession, d: String): DataFrame = {
    val deltas = concurrencyDeltas(Tables.events(s, d))
      .withColumn("hstart", date_trunc("hour", col("t")))
    val wHourly = Window.orderBy(col("hstart"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = deltas.groupBy(col("hstart"))
      .agg(sum(col("delta")).as("net"), count(lit(1)).as("n_edges"))
      .withColumn("base", coalesce(sum(col("net")).over(wHourly), lit(0L)))
    val wLocal = Window.partitionBy(col("hstart"))
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localPeak = deltas
      .withColumn("run", sum(col("delta")).over(wLocal))
      .groupBy(col("hstart")).agg(max(col("run")).as("local_max"))
    base.join(localPeak, Seq("hstart"))
      .select(col("hstart"), col("n_edges"),
        (col("base") + greatest(lit(0L), col("local_max"))).as("peak_concurrent"))
      .orderBy(col("hstart"))
  }

  private lazy val maxConcurrencySql =
    """WITH deltas AS (
      |  SELECT t, delta, date_trunc('hour', t) AS hstart FROM (
      |    SELECT ts AS t, CAST(1 AS BIGINT) AS delta FROM events
      |    UNION ALL
      |    SELECT ts + INTERVAL 30 MINUTE AS t, CAST(-1 AS BIGINT) AS delta FROM events)),
      |b AS (SELECT hstart, SUM(delta) AS net, COUNT(*) AS n_edges
      |      FROM deltas GROUP BY hstart),
      |base AS (SELECT hstart, n_edges,
      |    COALESCE(SUM(net) OVER (ORDER BY hstart
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
      |  FROM b),
      |run AS (SELECT hstart,
      |    SUM(delta) OVER (PARTITION BY hstart ORDER BY t, delta
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM deltas),
      |lp AS (SELECT hstart, MAX(run) AS local_max FROM run GROUP BY hstart)
      |SELECT base.hstart, CAST(base.n_edges AS BIGINT) AS n_edges,
      |       CAST(base.base + GREATEST(0, lp.local_max) AS BIGINT) AS peak_concurrent
      |FROM base JOIN lp ON base.hstart = lp.hstart
      |ORDER BY base.hstart""".stripMargin

  /** q199: TEMPORAL EMBARGO SPLIT — the time-series complement of
    * q149's hash-split leakage audit (purged walk-forward splitting,
    * the de-facto standard wherever adjacent-in-time records leak
    * label information): train = events before (cutoff − embargo),
    * embargoed = the 3 days before the cutoff (dropped), test = from
    * the cutoff on. The leakage metric is the pair count a NAIVE
    * cutoff-only split would admit — same-user (train∪embargo, test)
    * event pairs closer than the embargo span — computed per user
    * with one window (max pre-cutoff ts vs min post-cutoff ts), and
    * the purged split's own count, which the construction forces to
    * ZERO (the oracle proves it, not the comment). Output: one row
    * per split with events, users, value mass, plus the two leakage
    * counts. One user-keyed shuffle; everything else map-side. */
  def temporalEmbargo(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
    val embargoS = 3 * 86400
    val purgeStart = cutoff - expr(s"INTERVAL $embargoS SECONDS")
    val tagged = Tables.events(s, d).withColumn("split",
      when(col("ts") < purgeStart, "train")
        .when(col("ts") < cutoff, "embargoed")
        .otherwise("test"))
    val perUser = tagged.groupBy(col("user_id")).agg(
      max(when(col("split") === "train", col("ts"))).as("last_train"),
      max(when(col("split") =!= "test", col("ts"))).as("last_pre"),
      min(when(col("split") === "test", col("ts"))).as("first_test"))
    val leak = perUser.agg(
      sum(when(col("first_test").isNotNull && col("last_pre").isNotNull &&
        unix_micros(col("first_test")) - unix_micros(col("last_pre"))
          < embargoS * 1000000L, 1L).otherwise(0L)).as("naive_leaky_users"),
      sum(when(col("first_test").isNotNull && col("last_train").isNotNull &&
        unix_micros(col("first_test")) - unix_micros(col("last_train"))
          < embargoS * 1000000L, 1L).otherwise(0L)).as("purged_leaky_users"))
    tagged.groupBy(col("split")).agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("value_mass"))
      .crossJoin(broadcast(leak))
      .orderBy(col("split"))
  }

  private lazy val temporalEmbargoSql = {
    val embargoUs = 3L * 86400 * 1000000
    s"""WITH tagged AS (SELECT *,
       |    CASE WHEN ts < TIMESTAMP '2024-01-17 00:00:00' THEN 'train'
       |         WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN 'embargoed'
       |         ELSE 'test' END AS split
       |  FROM events),
       |pu AS (SELECT user_id,
       |    MAX(CASE WHEN split = 'train' THEN ts END) AS last_train,
       |    MAX(CASE WHEN split <> 'test' THEN ts END) AS last_pre,
       |    MIN(CASE WHEN split = 'test' THEN ts END) AS first_test
       |  FROM tagged GROUP BY user_id),
       |leak AS (SELECT
       |    CAST(SUM(CASE WHEN first_test IS NOT NULL AND last_pre IS NOT NULL
       |      AND epoch_us(first_test) - epoch_us(last_pre) < $embargoUs
       |      THEN 1 ELSE 0 END) AS BIGINT) AS naive_leaky_users,
       |    CAST(SUM(CASE WHEN first_test IS NOT NULL AND last_train IS NOT NULL
       |      AND epoch_us(first_test) - epoch_us(last_train) < $embargoUs
       |      THEN 1 ELSE 0 END) AS BIGINT) AS purged_leaky_users
       |  FROM pu)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
       |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       |       ${dsumSql("value")} AS value_mass,
       |       leak.naive_leaky_users, leak.purged_leaky_users
       |FROM tagged, leak
       |GROUP BY split, leak.naive_leaky_users, leak.purged_leaky_users
       |ORDER BY split""".stripMargin
  }

  /** q204: LINEAR multi-touch attribution — q194's other operating
    * point: instead of crediting the last touch, the purchase value
    * splits EQUALLY across every touch (click/view/signup) by the
    * same user within the 7-day lookback; touchless purchases stay
    * 'direct' at full value. Shape: a user-keyed self-band-join
    * (purchases × touches, 0 < Δt ≤ 7 d) — NO window function at all,
    * so the op has no ordering sensitivity: ties, duplicates, and
    * arrival order cannot change a credit. Per-purchase touch counts
    * come from the same join, and the per-channel dashboard
    * aggregates credited value.
    *
    * Scale shape: ONE shuffle on user_id for the band join (per-user
    * volumes bound the pair fan-out; at 100 TB a skewed user salts
    * exactly like q92), then a ≤4-group rollup. The credit division
    * value/n is one IEEE op on exact inputs — identical cross-engine;
    * the DECIMAL(28,8) exact-sum pattern absorbs the accumulation. */
  def linearAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"),
        col("ts").as("pts"), col("value").as("pv"))
    val touches = ev.filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id").as("tu"), col("ts").as("tts"),
        col("event_type").as("channel"))
    val joined = purchases.join(touches,
      col("pu") === col("tu") &&
        col("tts") < col("pts") &&
        unix_micros(col("pts")) - unix_micros(col("tts")) <= 7L * 86400 * 1000000,
      "left")
    val counted = joined.groupBy(col("pid"), col("pv"))
      .agg(count(col("channel")).as("n_touches"))
    val credited = joined.filter(col("channel").isNotNull)
      .join(counted.select(col("pid"), col("n_touches")).hint("shuffle_hash"),
        Seq("pid"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        dsum(col("pv") / col("n_touches")).as("credited_value"))
    val direct = counted.filter(col("n_touches") === 0)
      .agg(count(lit(1)).as("n_credits"), dsum(col("pv")).as("credited_value"))
      .select(lit("direct").as("channel"), col("n_credits"), col("credited_value"))
    credited.unionByName(direct)
      .filter(col("n_credits") > 0)
      .orderBy(col("channel"))
  }

  private lazy val linearAttributionSql = {
    val lookbackUs = 7L * 86400 * 1000000
    s"""WITH p AS (SELECT event_id AS pid, user_id AS pu, ts AS pts, value AS pv
       |      FROM events WHERE event_type = 'purchase'),
       |t AS (SELECT user_id AS tu, ts AS tts, event_type AS channel
       |      FROM events WHERE event_type IN ('click','view','signup')),
       |j AS (SELECT p.pid, p.pv, t.channel
       |      FROM p LEFT JOIN t ON p.pu = t.tu AND t.tts < p.pts
       |        AND epoch_us(p.pts) - epoch_us(t.tts) <= $lookbackUs),
       |c AS (SELECT pid, pv, COUNT(channel) AS n_touches FROM j GROUP BY pid, pv),
       |cr AS (SELECT j.channel, COUNT(*) AS n_credits,
       |        ${dsumSql("j.pv / c.n_touches")} AS credited_value
       |       FROM j JOIN c ON j.pid = c.pid
       |       WHERE j.channel IS NOT NULL GROUP BY j.channel),
       |dr AS (SELECT 'direct' AS channel, COUNT(*) AS n_credits,
       |        ${dsumSql("pv")} AS credited_value
       |       FROM c WHERE n_touches = 0)
       |SELECT channel, CAST(n_credits AS BIGINT) AS n_credits, credited_value
       |FROM (SELECT * FROM cr UNION ALL SELECT * FROM dr)
       |WHERE n_credits > 0
       |ORDER BY channel""".stripMargin
  }

  /** q209: POSITION-BASED + TIME-DECAY attribution — the remaining two
    * operating points of the credit family (q194 last-touch, q204
    * linear). Same 7-day-lookback band join; what changes is the
    * weight function, and both are chosen so the weights are
    * cross-engine EXACT:
    *   - position (U-shaped 40/20/40): 1 touch → 1.0; 2 → 0.5 each;
    *     n≥3 → first and last 0.4, middles split 0.2/(n−2).
    *   - time-decay: w = 2^(−⌊Δdays⌋), half-life one day at day grain.
    *     ⌊Δdays⌋ is INTEGER arithmetic on epoch micros, so the
    *     normalized share is a ratio of SMALL INTEGERS num/m
    *     (num = 2^(6−k) ≤ 64, m = Σnum per purchase) — no pow(),
    *     whose last ulp differs across libm implementations, anywhere
    *     near the hash. The exponent is CLAMPED at 0 (ADVICE_r15):
    *     the band join keeps Δ ≤ 7 days INCLUSIVE, so a touch landing
    *     exactly on the boundary has ⌊Δdays⌋ = 7 and an unclamped
    *     6 − k = −1 — which Spark's shiftleft MASKS to 1L<<63 =
    *     Long.MIN_VALUE (poisoning m and every wdec in the purchase)
    *     while DuckDB's << does not, a latent cross-engine hash break.
    *     greatest(0, 6−k) in BOTH engines gives the boundary touch the
    *     day-6 weight; AttributionBoundarySpec pins the exact-boundary
    *     row.
    * Every weight is ROUND(·, 6)ed before it multiplies a value: the
    * 2-dp values × 6-dp weights land ~1e-12 off an exact 8-dp grid
    * point, so the dsum DECIMAL(28,8) quantization can never hit a
    * tie (raw num/m terms DID: two rows at sf0.01 flipped on the
    * engines' double→decimal tie conventions). The round itself is
    * tie-free because a ratio with denominator < 5^6·… cannot
    * terminate in a 5 exactly at the 7th decimal — valid while a
    * purchase sees < 244 touches in the lookback (m < 15625); beyond
    * that, widen the round. Corpus max here: 19.
    * Touch order inside a purchase is pinned by (tts, touch event_id),
    * so equal-timestamp touches cannot flip first/last credit.
    *
    * Scale shape: q204's band join + ONE pid-partitioned window pass
    * (purchase-grain partitions: a few touches each, skew-free) + a
    * ≤|channels| aggregate. */
  def positionDecayAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"),
        col("ts").as("pts"), col("value").as("pv"))
    val touches = ev.filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id").as("tu"), col("ts").as("tts"),
        col("event_id").as("tid"), col("event_type").as("channel"))
    val cond = col("pu") === col("tu") &&
      col("tts") < col("pts") &&
      unix_micros(col("pts")) - unix_micros(col("tts")) <= 7L * 86400 * 1000000
    val w = Window.partitionBy(col("pid")).orderBy(col("tts"), col("tid"))
    val wAll = Window.partitionBy(col("pid"))
    val credited = purchases.join(touches, cond)
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("wpos",
        when(col("n") === 1, 1.0).when(col("n") === 2, 0.5)
          .when(col("rk") === 1 || col("rk") === col("n"), 0.4)
          .otherwise(round(lit(0.2) / (col("n") - 2), 6)))
      .withColumn("num", expr(
        "shiftleft(1L, greatest(0, 6 - CAST((unix_micros(pts) - " +
          "unix_micros(tts)) DIV 86400000000 AS INT)))"))
      .withColumn("m", sum(col("num")).over(wAll))
      .withColumn("wdec", round(col("num").cast("double") / col("m"), 6))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        dsum(col("pv") * col("wpos")).as("pos_value"),
        dsum(col("pv") * col("wdec")).as("decay_value"))
    val direct = purchases.join(touches, cond, "left")
      .groupBy(col("pid"), col("pv"))
      .agg(count(col("channel")).as("n_touches"))
      .filter(col("n_touches") === 0)
      .agg(count(lit(1)).as("n_credits"),
        dsum(col("pv")).as("pos_value"), dsum(col("pv")).as("decay_value"))
      .select(lit("direct").as("channel"), col("n_credits"),
        col("pos_value"), col("decay_value"))
    credited.unionByName(direct)
      .filter(col("n_credits") > 0)
      .orderBy(col("channel"))
  }

  private lazy val positionDecayAttributionSql = {
    val lookbackUs = 7L * 86400 * 1000000
    s"""WITH p AS (SELECT event_id AS pid, user_id AS pu, ts AS pts, value AS pv
       |      FROM events WHERE event_type = 'purchase'),
       |t AS (SELECT user_id AS tu, ts AS tts, event_id AS tid,
       |        event_type AS channel
       |      FROM events WHERE event_type IN ('click','view','signup')),
       |j AS (SELECT p.pid, p.pv, p.pts, t.tts, t.tid, t.channel
       |      FROM p JOIN t ON p.pu = t.tu AND t.tts < p.pts
       |        AND epoch_us(p.pts) - epoch_us(t.tts) <= $lookbackUs),
       |r AS (SELECT *,
       |        ROW_NUMBER() OVER (PARTITION BY pid ORDER BY tts, tid) AS rk,
       |        COUNT(*) OVER (PARTITION BY pid) AS n,
       |        1::BIGINT << GREATEST(0, CAST(6 - (epoch_us(pts) - epoch_us(tts))
       |              // 86400000000 AS INT)) AS num
       |      FROM j),
       |rw AS (SELECT *,
       |        CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5
       |             WHEN rk = 1 OR rk = n THEN 0.4
       |             ELSE ROUND(0.2 / (n - 2), 6) END AS wpos,
       |        ROUND(CAST(num AS DOUBLE) /
       |              SUM(num) OVER (PARTITION BY pid), 6) AS wdec
       |      FROM r),
       |cr AS (SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
       |        ${dsumSql("pv * wpos")} AS pos_value,
       |        ${dsumSql("pv * wdec")} AS decay_value
       |       FROM rw GROUP BY channel),
       |c AS (SELECT p.pid, p.pv, COUNT(t.channel) AS n_touches
       |      FROM p LEFT JOIN t ON p.pu = t.tu AND t.tts < p.pts
       |        AND epoch_us(p.pts) - epoch_us(t.tts) <= $lookbackUs
       |      GROUP BY p.pid, p.pv),
       |dr AS (SELECT 'direct' AS channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
       |        ${dsumSql("pv")} AS pos_value, ${dsumSql("pv")} AS decay_value
       |       FROM c WHERE n_touches = 0)
       |SELECT channel, n_credits, pos_value, decay_value
       |FROM (SELECT * FROM cr UNION ALL SELECT * FROM dr)
       |WHERE n_credits > 0
       |ORDER BY channel""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q209_position_decay_attribution", positionDecayAttribution,
      Some(positionDecayAttributionSql),
      "position-based (U-shaped) + exact-dyadic time-decay attribution over the 7-day band join"),
    QueryDef("q204_linear_attribution", linearAttribution, Some(linearAttributionSql),
      "linear multi-touch attribution: equal credit across 7-day-lookback touches, no window"),
    QueryDef("q198_max_concurrency", maxConcurrency, Some(maxConcurrencySql),
      "sweep-line peak concurrency per hour: distributed prefix sum (hour-grain global + local)"),
    QueryDef("q199_temporal_embargo", temporalEmbargo, Some(temporalEmbargoSql),
      "purged walk-forward split: train/embargo/test masses + naive-vs-purged leakage counts"),
    QueryDef("q194_last_touch_attribution", lastTouchAttribution, Some(lastTouchAttributionSql),
      "last-touch attribution: per-channel purchases, revenue, time-to-convert (7-day lookback)"),
    QueryDef("q187_pit_features", pitFeatures, Some(pitFeaturesSql),
      "point-in-time feature join: state as of each event's own timestamp, leakage-free"),
    QueryDef("q184_scd2_intervals", scd2Intervals, Some(scd2IntervalsSql),
      "SCD type-2 dimension history: gaps-and-islands attribute runs to validity intervals"),
    QueryDef("q111_gapfill_resample", gapfillResample, Some(gapfillResampleSql),
      "time-series gap-fill: hourly grid densification + forward fill per user"),
    QueryDef("q60_tumbling_hourly", tumblingHourly, Some(tumblingHourlySql), "B38 tumbling window"),
    QueryDef("q77_interval_join", intervalJoin, Some(intervalJoinSql), "interval join (batch twin of stream-stream join)"),
    QueryDef("q68_funnel_path", funnelUsers, Some(funnelUsersSql), "sequence/funnel analytics"),
    QueryDef("q72_retention_curve", retentionCurve, Some(retentionCurveSql), "cohort/retention analytics"),
    QueryDef("q61_sliding_quarter", slidingQuarter, Some(slidingQuarterSql), "B39 sliding window"),
    QueryDef("q62_session_windows", sessionWindows, Some(sessionWindowsSql), "B40 session window"))
}
