package graft.ops

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

import graft.{QueryDef, Tables}
import graft.ingest.Sinks
import graft.streaming.StreamingOps

/** The graded leg of the streaming surface (VERDICT_r14 #2): the 8
  * streaming twins were spec-verified only because streaming semantics
  * aren't DuckDB-comparable — but the FINAL STATE of a bounded stream
  * is. q207 does for the watermark/foreachBatch machinery what q190
  * did for the sink: it stages the events corpus as time-ordered
  * files, drives them through [[StreamingOps.concurrencyHourlyNets]]
  * (the q198 twin, shared verbatim) as a genuine multi-micro-batch
  * incremental aggregation, lands each update-mode emission through
  * the idempotent JDBC upsert (A17), and returns the table read back.
  * The oracle recomputes the hourly nets directly with batch SQL — the
  * same arithmetic q198's already-hash-matched oracle uses — so a
  * dropped-as-late row, a watermark that evicts state a later batch
  * still needs, a missed update emission, or a non-idempotent replay
  * all break the hash.
  */
object StreamGradedOps {

  /** Stage a ts-carrying frame as K single-file slices in ascending
    * time order, with both modification times and file names
    * increasing so the file source's arrival order IS time order — the
    * shape a log-shipping ingest delivers in production, and the
    * precondition under which a 1-hour watermark provably never drops
    * a row here: slice i's max event time is maxTs_i + 30 min (the −1
    * endpoint), so the watermark after slice i sits 30 min BEFORE the
    * next slice's smallest endpoint, and boundary-hour windows stay
    * unevictable until every contributing slice has arrived.
    *
    * ONE PASS over the corpus (VERDICT_r15 #2: the k filtered rescans
    * were 26.7 s of the 100× suite and most of q207's isolated 109 s
    * at 1000×): the slice id is a map-side integer column,
    * `repartition(k, slice)` keeps the scan wide while hash-routing
    * each slice's rows to exactly one writer task, and
    * `partitionBy(slice)` splits that task's output per value — one
    * file per non-empty slice, renamed into arrival order. Slice
    * arithmetic is unchanged from the k-pass version (same integer
    * bounds), so the staged bytes — and the graded hash — are
    * identical. */
  private[graft] def stageSlices(ev: DataFrame, k: Int, stage: Path,
      work: Path): Unit = {
    val mm = ev.agg(min(col("ts")).cast("long").as("lo"),
      max(col("ts")).cast("long").as("hi")).collect()(0) // 1 row: bounds only
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val step = math.max(1L, (hi - lo) / k + 1)
    // (ts - lo) / step < k by construction of step; no clamp needed
    ev.withColumn("slice",
        ((col("ts").cast("long") - lo) / step).cast("int"))
      .repartition(k, col("slice"))
      .write.mode("overwrite").partitionBy("slice").parquet(work.toString)
    (0 until k).foreach { i =>
      val sliceDir = work.resolve(s"slice=$i")
      if (Files.isDirectory(sliceDir)) {
        // try-with-resources on the directory stream (ADVICE_r15: the
        // unclosed Files.list leaked a handle per invocation)
        val ls = Files.list(sliceDir)
        val part =
          try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
          finally ls.close()
        val dst = stage.resolve(f"slice_$i%02d.parquet")
        Files.move(part, dst)
        Files.setLastModifiedTime(dst,
          FileTime.fromMillis(1700000000000L + i * 60000L))
      }
    }
  }

  /** Recursive delete for the staging/checkpoint temp dirs — Verify
    * and Bench invoke each graded query twice, and scale suites were
    * accumulating a copy of the staged columns per invocation
    * (ADVICE_r15). Deliberately quiet on failure: cleanup must never
    * fail a graded query. */
  private[graft] def deleteQuietly(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try {
        val it = walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator()
        while (it.hasNext) {
          try Files.deleteIfExists(it.next()) catch { case _: Exception => }
        }
      } finally walk.close()
    }

  private val netsSchema = StructType(Seq(
    StructField("hstart", TimestampType),
    StructField("net", LongType),
    StructField("n_edges", LongType)))

  /** q207: STREAMING CONCURRENCY NETS under the oracle — stage, stream
    * in 4 micro-batches, upsert each update emission, read back.
    * Scale shape: the stateful aggregation holds ≤ one (net, n_edges)
    * pair per OPEN hour (watermark closes the rest), the sink write is
    * one task per batch sized to the target's ingest width (the q190
    * lesson), and the staging pass is a one-shot filter+write that a
    * real deployment replaces with its log shipper. */
  def streamingConcurrency(s: SparkSession, d: String): DataFrame = {
    val url = "jdbc:derby:memory:graft_q207;create=true"
    val table = "q207_nets"
    val stage = Files.createTempDirectory("q207stage")
    val work = Files.createTempDirectory("q207work")
    val ckpt = Files.createTempDirectory("q207ckpt")
    try {
      stageSlices(Tables.events(s, d).select(col("ts")), 4, stage, work)
      // fresh table per invocation (Verify and Bench call queries twice)
      Sinks.writeJdbc(s.createDataFrame(
        new java.util.ArrayList[Row](), netsSchema), url, table,
        numPartitions = 1)
      val src = s.readStream
        .schema(StructType(Seq(StructField("ts", TimestampType))))
        .option("maxFilesPerTrigger", "1")
        .parquet(stage.toString)
      val q = StreamingOps.concurrencyHourlyNets(src)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          Sinks.upsertJdbc(b.toDF(), url, table, Seq("hstart"),
            numPartitions = 1)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally Seq(work, stage, ckpt).foreach(deleteQuietly)
    // the returned frame reads the Derby table, not the staged files —
    // safe to clean the staging dirs before the caller materializes it
    Sinks.readJdbc(s, url, table)
      .select(col("hstart"), col("net").cast("long"),
        col("n_edges").cast("long"))
      .orderBy(col("hstart"))
  }

  private val attribSchema = StructType(Seq(
    StructField("imp_id", LongType),
    StructField("click_id", LongType),
    StructField("user_id", LongType),
    StructField("imp_ts", TimestampType),
    StructField("click_ts", TimestampType)))

  /** q213: the STREAM-STREAM INTERVAL JOIN under the oracle
    * (VERDICT_r15 #1 — the stateful-join leg the q207 recipe hadn't
    * graded): stage the events corpus as time-ordered slices, read
    * them back as ONE file stream, split it into the view and click
    * sides, and drive them through [[StreamingOps.attributedClicks]]
    * (shared verbatim — the two-sided-watermark join StreamingSpec
    * exercises) as a genuine 4-micro-batch stateful join; every
    * append-mode emission lands through the idempotent upsert keyed on
    * the join pair, and the table is read back sorted. The oracle is
    * the batch interval join in plain SQL (q77's shape at the
    * attributedClicks operating point: clicks within [imp_ts,
    * imp_ts + 30 min] for the same user), so a match dropped by early
    * state eviction, a buffered row the watermark lost, or a
    * double-emitted pair under replay all break the hash.
    *
    * Why no row can drop here (the two-sided eviction proof the query
    * grades): arrival order is time order, so when a click in slice j
    * probes the impression store, the join watermark still trails
    * slice j−1's max by the 10-min delay — and every impression a
    * click can match has imp_ts ≥ click_ts − 30 min, which sits ABOVE
    * the eviction line (watermark − 30 min) by construction. A click
    * can never arrive in an earlier slice than its impression
    * (click_ts ≥ imp_ts), so the pair is always live simultaneously.
    *
    * Scale shape: state = impressions within (watermark − 30 min,
    * now] + clicks within the watermark delay — bounded buffers on
    * two unbounded streams, the interval IS the eviction policy; the
    * sink is one task per batch. */
  def streamingAttribution(s: SparkSession, d: String): DataFrame = {
    val url = "jdbc:derby:memory:graft_q213;create=true"
    val table = "q213_attrib"
    val stage = Files.createTempDirectory("q213stage")
    val work = Files.createTempDirectory("q213work")
    val ckpt = Files.createTempDirectory("q213ckpt")
    try {
      stageSlices(Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type")),
        4, stage, work)
      Sinks.writeJdbc(s.createDataFrame(
        new java.util.ArrayList[Row](), attribSchema), url, table,
        numPartitions = 1)
      val src = s.readStream
        .schema(StructType(Seq(
          StructField("event_id", LongType),
          StructField("ts", TimestampType),
          StructField("user_id", LongType),
          StructField("event_type",
            org.apache.spark.sql.types.StringType))))
        .option("maxFilesPerTrigger", "1")
        .parquet(stage.toString)
      val joined = StreamingOps.attributedClicks(
        src.filter(col("event_type") === "view"),
        src.filter(col("event_type") === "click"))
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          Sinks.upsertJdbc(b.toDF(), url, table, Seq("imp_id", "click_id"),
            numPartitions = 1)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally Seq(work, stage, ckpt).foreach(deleteQuietly)
    Sinks.readJdbc(s, url, table)
      .select(col("imp_id").cast("long"), col("click_id").cast("long"),
        col("user_id").cast("long"), col("imp_ts"), col("click_ts"))
      .orderBy(col("imp_id"), col("click_id"))
  }

  private val streamingAttributionSql =
    """WITH i AS (SELECT event_id AS imp_id, user_id, ts AS imp_ts
      |      FROM events WHERE event_type = 'view'),
      |c AS (SELECT event_id AS click_id, user_id AS c_user, ts AS click_ts
      |      FROM events WHERE event_type = 'click')
      |SELECT imp_id, click_id, user_id, imp_ts, click_ts
      |FROM i JOIN c ON user_id = c_user
      |  AND click_ts >= imp_ts
      |  AND click_ts <= imp_ts + INTERVAL 30 MINUTE
      |ORDER BY imp_id, click_id""".stripMargin

  private val streamingConcurrencySql =
    """SELECT date_trunc('hour', t) AS hstart,
      |       CAST(SUM(delta) AS BIGINT) AS net,
      |       CAST(COUNT(*) AS BIGINT) AS n_edges
      |FROM (SELECT ts AS t, 1 AS delta FROM events
      |      UNION ALL
      |      SELECT ts + INTERVAL 30 MINUTE AS t, -1 AS delta FROM events)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q207_streaming_concurrency", streamingConcurrency,
      Some(streamingConcurrencySql),
      "B38+ under the oracle: multi-batch watermarked stream -> upsert -> read-back"),
    QueryDef("q213_streaming_attribution", streamingAttribution,
      Some(streamingAttributionSql),
      "B41 under the oracle: stateful stream-stream interval join, two-sided watermark eviction"))
}
