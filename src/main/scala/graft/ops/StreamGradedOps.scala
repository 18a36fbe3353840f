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

  /** Stage `ts` as K single-file slices in ascending time order, with
    * both modification times and file names increasing so the file
    * source's arrival order IS time order — the shape a log-shipping
    * ingest delivers in production, and the precondition under which
    * the 1-hour watermark provably never drops a row here: slice i's
    * max event time is maxTs_i + 30 min (the −1 endpoint), so the
    * watermark after slice i sits 30 min BEFORE the next slice's
    * smallest endpoint, and boundary-hour windows stay unevictable
    * until every contributing slice has arrived. */
  private def stageSlices(s: SparkSession, d: String, k: Int): Path = {
    val ev = Tables.events(s, d).select(col("ts"))
    val mm = ev.agg(min(col("ts")).cast("long").as("lo"),
      max(col("ts")).cast("long").as("hi")).collect()(0) // 1 row: bounds only
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val step = math.max(1L, (hi - lo) / k + 1)
    val stage = Files.createTempDirectory("q207stage")
    val work = Files.createTempDirectory("q207work")
    (0 until k).foreach { i =>
      val sliceDir = work.resolve(s"s$i")
      // repartition(1), NOT coalesce(1): coalesce collapses the whole
      // upstream filter into the single writer task (measured: the 4
      // staging scans were 1-thread-serial at the 24 GB corpus, most
      // of q207's 135 s there); repartition keeps the scan wide and
      // funnels only the slice's ts column through the one writer.
      ev.filter(col("ts").cast("long") >= lo + i * step &&
          col("ts").cast("long") < lo + (i + 1) * step)
        .repartition(1).write.mode("overwrite").parquet(sliceDir.toString)
      val part = Files.list(sliceDir).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = stage.resolve(f"slice_$i%02d.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    stage
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
    val stage = stageSlices(s, d, 4)
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
      .option("checkpointLocation",
        Files.createTempDirectory("q207ckpt").toString)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        Sinks.upsertJdbc(b.toDF(), url, table, Seq("hstart"),
          numPartitions = 1)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Sinks.readJdbc(s, url, table)
      .select(col("hstart"), col("net").cast("long"),
        col("n_edges").cast("long"))
      .orderBy(col("hstart"))
  }

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
      "B38+ under the oracle: multi-batch watermarked stream -> upsert -> read-back"))
}
