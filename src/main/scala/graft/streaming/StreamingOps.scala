package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming surface — SURVEY.md §2.B38/B41/B42.
  *
  * The batch twins of the window operators live in
  * graft.ops.WindowedOps (and are oracle-graded there); these wire the
  * SAME operators to unbounded sources with watermarks and state. The
  * streaming story at 100 TB: a continuously-arriving dump/event feed
  * is ingested incrementally — watermark bounds state, windows close
  * and emit exactly once, and dedup state expires instead of growing
  * forever. ScalaTest drives these with MemoryStream
  * (StreamingSpec). */
object StreamingOps {

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserCount(user_id: Long, n: Long)

  /** B38/B41: watermarked tumbling-window counts. Late rows beyond the
    * 10-minute watermark are dropped once the window finalizes
    * (append mode). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))

  /** B42: stateful dedup on the natural key; state for a key is freed
    * once the watermark passes it — bounded memory on an unbounded
    * stream (vs. dropDuplicates which keeps keys forever). */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  final case class SrcDoc(doc_id: Long, ts: java.sql.Timestamp,
    source: String, text: String)

  /** The near-dup GATE under Structured Streaming: incoming docs are
    * shingled and minhashed with the same codegen'd expressions the
    * batch dedup uses (stateless scalars — streaming-safe by
    * construction), and the first doc per LSH band wins within the
    * watermark horizon. This is the incremental-corpus form of
    * q30/q34: a continuously-ingested feed gets deduplicated
    * online with BOUNDED state (band keys expire with the watermark)
    * instead of re-clustering the corpus per batch. Docs too short to
    * shingle pass through on their exact-hash band. */
  def nearDupGate(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("ms",
        when(size(col("toks")) >= 3,
          graft.functions.GraftFunctions.minhashHex(
            graft.functions.GraftFunctions.shingles(col("toks"), 3), 4)))
      .withColumn("band",
        when(col("ms").isNotNull, concat(col("ms")(0), col("ms")(1)))
          .otherwise(sha2(col("text"), 256)))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("band"))
      .select(col("doc_id"), col("ts"), col("text"))

  /** q86's streaming form: sub-document dedup as a gate. Incoming docs
    * explode into the same 32-token chunks as the batch pass, and only
    * a chunk's FIRST corpus-wide occurrence within the watermark
    * horizon survives — the continuously-ingested version of the
    * C4-style repeated-paragraph removal, with state bounded to one
    * md5 key per distinct chunk seen inside the horizon. Output is the
    * surviving (doc_id, pos, chunk) stream; a downstream sink
    * reassembles docs from their kept chunks. Stateless expressions up
    * to the single dropDuplicates keep it streaming-safe, and the
    * dedup key is the 128-bit hash, never the chunk text. */
  def chunkDedupGate(docs: DataFrame): DataFrame =
    docs
      .withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), col("ts"), posexplode(expr(
        "transform(sequence(0, CAST(ceil(size(t)/32.0) AS INT) - 1), " +
          "i -> array_join(slice(t, i*32+1, 32), ' '))")))
      .withColumn("k", md5(col("col")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("k"))
      .select(col("doc_id"), col("pos"), col("col").as("chunk"))

  /** q181's streaming form: CONTENT-DEFINED chunk dedup at the stream
    * edge. Incoming docs chunk at the same 4-token rolling-hash
    * boundaries as the batch pass (graft.ops.TextOps.cdc*Expr, shared
    * verbatim), so an edited re-crawl of a doc re-aligns on every
    * chunk outside the edit and the gate drops them as already-seen —
    * the property that makes chunk dedup survive edits, applied at
    * ingest. Only a chunk's FIRST occurrence within the watermark
    * horizon survives; state = one md5 key per distinct chunk in the
    * horizon (the [[chunkDedupGate]] bound), and every expression up
    * to the dropDuplicates is stateless. */
  def cdcDedupGate(docs: DataFrame): DataFrame =
    docs
      .withColumn("t", split(col("text"), " "))
      .withColumn("v", expr(graft.ops.TextOps.cdcTokvalExpr))
      .withColumn("c", expr(graft.ops.TextOps.cdcCutsExpr))
      .withColumn("st", expr(graft.ops.TextOps.cdcStartsExpr))
      .withColumn("en", expr(graft.ops.TextOps.cdcEndsExpr))
      .select(col("doc_id"), col("ts"),
        posexplode(expr(graft.ops.TextOps.cdcChunkTextsExpr)))
      .withColumn("k", md5(col("col")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("k"))
      .select(col("doc_id"), col("pos"), col("col").as("chunk"))

  /** q93's streaming form: per-tumbling-window heavy-hitter CANDIDATE
    * sets over the incoming word stream, via the same Misra–Gries
    * `TypedImperativeAggregate` the batch query uses. The sketch
    * buffer (≤k counters) is exactly the bounded state streaming
    * aggregation wants — state per open window is O(k) however wide
    * the word domain — and the superset guarantee carries over, so a
    * downstream consumer re-counts candidates exactly (the batch
    * query's second pass) or treats them as a monitoring signal
    * as-is. Watermark closes windows in append mode; late words drop
    * with it. */
  def heavyHitterWindows(docs: DataFrame): DataFrame =
    docs
      .select(col("ts"), explode(split(col("text"), " ")).as("w"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(graft.functions.GraftFunctions.heavyHitterCandidates(col("w"), 15).as("cands"),
        count(lit(1)).as("n_words"))
      .select(col("window.start").as("wstart"), col("cands"), col("n_words"))

  /** Windowed streaming percentiles — [[graft.functions.LogHistogramAgg]]
    * (the q110 quantile sketch) as bounded per-window state: p50/p99
    * of the event value per hourly window, integer-cents quantized
    * exactly like the batch twin. The same mergeable-sketch property
    * that makes the aggregate partitioning-independent in batch makes
    * it a legal streaming state: O(buckets) per open window, no
    * retained rows, late data past the watermark dropped. The
    * latency-dashboard shape (p99 per window) at ingest scale. */
  def percentileWindows(events: DataFrame): DataFrame =
    events
      .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.GraftFunctions
        .logPercentiles(col("cents"), Seq(0.5, 0.99)).as("p"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"),
        element_at(col("p"), 1).as("p50_cents"),
        element_at(col("p"), 2).as("p99_cents"))

  /** Stream-STATIC decontamination gate — the q69/q103 contract moved
    * to ingest time: each arriving doc left-anti joins a static
    * benchmark frame on the exact text hash, so contaminated docs
    * never enter the corpus at all. The stream-static join is the
    * guard/enrichment shape at ingest scale: Spark re-plans the
    * static side per micro-batch (broadcast while it fits — the same
    * threshold story as q103), and the join itself holds ZERO
    * streaming state; only the hash leaves the row for the probe. */
  def decontaminationGate(docs: DataFrame, benchmark: DataFrame): DataFrame = {
    val probe = benchmark.select(sha2(col("text"), 256).as("h")).distinct()
    docs.withColumn("h", sha2(col("text"), 256))
      .join(probe, Seq("h"), "left_anti")
      .select(col("doc_id"), col("ts"), col("text"))
  }

  /** Stream-STATIC NEAR-dup ingest gate — the q105 pigeonhole at
    * ingest time, the fuzzy complement of [[decontaminationGate]]'s
    * exact-hash guard: each arriving doc's four 16-bit SimHash bands
    * (the SAME majority-vote expressions as the batch builder,
    * [[graft.ops.TextOps.simhashBandExprs]], computed per-row with no
    * state) probe a static band index of the accumulated corpus. A
    * band hit means Hamming ≤ 3 is POSSIBLE (the pigeonhole
    * direction that never misses), so the gate emits every doc with a
    * `near_candidate` flag — route flagged docs to the exact verify
    * (q105's bit_count) or quarantine, pass the rest straight in.
    *
    * Plan shape: four stream-static LEFT joins (one per band
    * position), each keyed on the band value against the tiny
    * distinct index — the static side re-plans per micro-batch and
    * broadcasts while it fits; the stream holds ZERO state (no
    * explode-then-distinct, which would need a stateful dedup).
    * At 100 TB the index is the incrementally-maintained signature
    * table the batch pipeline (q105/q124) already persists. */
  def nearDupGate(docs: DataFrame, corpus: DataFrame): DataFrame = {
    val nBands = 4
    val bandExprs = graft.ops.TextOps.simhashBandExprs(nBands)
    def withBands(df: DataFrame, names: Int => String): DataFrame =
      df.withColumn("hs", transform(split(col("text"), " "), t => md5(t)))
        .select(df.columns.map(col).toSeq ++
          bandExprs.zipWithIndex.map { case (e, b) => e.as(names(b)) }: _*)
        .drop("hs")
    val index = (0 until nBands).map { b =>
      withBands(corpus.select(col("text")), i => s"v$i")
        .select(lit(b).as("band"), col(s"v$b").as("v"))
    }.reduce(_ unionAll _).distinct()
    var cur = withBands(docs, i => s"b$i")
    (0 until nBands).foreach { b =>
      cur = cur.join(
        broadcast(index.filter(col("band") === b)
          .select(col("v").as(s"b$b"), lit(1L).as(s"m$b"))),
        Seq(s"b$b"), "left")
    }
    cur.select(col("doc_id"), col("ts"), col("text"),
      (0 until nBands).map(b => col(s"m$b").isNotNull)
        .reduce(_ || _).as("near_candidate"))
  }

  /** Stream-STATIC DSIR scoring gate — q140's importance model applied
    * at ingest time: each arriving doc's hashed-bigram buckets (the
    * same codegen'd [[graft.functions.BigramBuckets]] pass as the
    * batch scorer) fold against the static 1-row log-ratio model
    * frame ([[graft.ops.CurationOps.dsirModel]]), and the doc is
    * emitted with its weight plus a `keep` flag at the caller's
    * threshold. The model rides a broadcast of ONE row (a 16-entry
    * map) — re-planned per micro-batch like every static side — and
    * the stream holds ZERO state: scoring is map-only, so the gate
    * adds no shuffle to the ingest path at any rate. Docs under 2
    * tokens have no features and score 0 (kept iff 0 ≥ threshold). */
  def dsirGate(docs: DataFrame, model: DataFrame, threshold: Double): DataFrame =
    docs
      .withColumn("bks", graft.functions.GraftFunctions
        .bigramBuckets(split(col("text"), " ")))
      .crossJoin(broadcast(model))
      .withColumn("weight", when(size(col("bks")) > 0,
        graft.ops.CurationOps.dsirWeightExpr).otherwise(lit(0.0)))
      .select(col("doc_id"), col("ts"), col("text"), col("weight"),
        (col("weight") >= threshold).as("keep"))

  /** Stream-STATIC in-domain perplexity gate — q155's CCNet scorer at
    * ingest time: each arriving doc scores under the broadcast 1-row
    * target-domain KN model
    * ([[graft.ops.StatsOps.indomainLmModel]] — map columns at
    * bigram-type grain, the dsirGate shape one size up) and carries a
    * keep flag at the caller's perplexity ceiling. Map-only, zero
    * streaming state, no shuffle on the ingest path; the fold sums
    * plain-double log-probs (the batch scorer's exact-decimal route
    * exists for cross-ENGINE determinism, which a single-engine
    * stream does not need — agreement with batch q155 is within the
    * ROUND(4) grain, asserted in StreamingSpec). Docs under 2 tokens
    * have no bigrams and score ppl 0 (kept: nothing to judge). */
  def indomainPplGate(docs: DataFrame, model: DataFrame,
      maxPpl: Double): DataFrame =
    docs
      .withColumn("tk", split(col("text"), " "))
      .crossJoin(broadcast(model))
      .withColumn("n_bi", greatest(size(col("tk")) - 1, lit(0)).cast("long"))
      // sequence(1, greatest(size-1, 1)) sidesteps the descending
      // sequence(1, 0) trap; the 1-token row's garbage term is never
      // read because the CASE below takes the n_bi = 0 branch
      .withColumn("ppl", when(col("n_bi") > 0, round(exp(-expr(
        "aggregate(transform(sequence(1, greatest(size(tk) - 1, 1)), " +
          "i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2)), " +
          "CAST(0.0 AS DOUBLE), (acc, x) -> acc + ln(" +
          graft.ops.StatsOps.knMapProbSql + "))") / col("n_bi")), 4))
        .otherwise(lit(0.0)))
      .select(col("doc_id"), col("ts"), col("text"), col("n_bi"), col("ppl"),
        (col("n_bi") === 0 || col("ppl") <= maxPpl).as("keep"))

  /** The monitoring twin of [[decontaminationGate]]: a stream-static
    * LEFT join flags (rather than drops) benchmark matches and a
    * watermarked hourly window counts clean vs contaminated arrivals —
    * the dashboard series an ingest pipeline alarms on. State is one
    * window aggregate per open hour, nothing per-doc. */
  def contaminationMonitor(docs: DataFrame, benchmark: DataFrame): DataFrame = {
    val probe = benchmark.select(sha2(col("text"), 256).as("h")).distinct()
      .withColumn("bad", lit(1L))
    docs.withColumn("h", sha2(col("text"), 256))
      .join(probe, Seq("h"), "left")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(sum(when(col("bad").isNotNull, 1L).otherwise(0L)).as("contaminated_docs"),
        sum(when(col("bad").isNull, 1L).otherwise(0L)).as("clean_docs"))
      .select(col("window.start").as("wstart"),
        col("contaminated_docs"), col("clean_docs"))
  }

  /** The monitoring twin of q162's batch KS drift: per closed
    * watermarked hourly window, the Kolmogorov-Smirnov statistic
    * between the window's token-length distribution and the static
    * reference CDF ([[graft.ops.StatsOps.lengthRefCdf]], a 1-row
    * broadcast at length grain) with a drift flag at the caller's
    * threshold — the dashboard series that catches "this feed changed
    * its document shape" within an hour of it happening. The supremum
    * is evaluated on the reference length grid (which contains every
    * length the reference corpus produced — the standard binned-KS
    * monitor; a window length outside the grid clamps into its
    * neighbors' steps). State is one open window's length list —
    * bounded by rate × window like every monitor here. */
  def lengthDriftMonitor(docs: DataFrame, refCdf: DataFrame,
      threshold: Double): DataFrame =
    docs
      .withColumn("len", size(split(col("text"), " ")).cast("long"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(col("len"))).as("ls"))
      .crossJoin(broadcast(refCdf))
      .withColumn("ks", round(expr(
        "array_max(transform(ref, r -> " +
          "abs(CAST(size(filter(ls, x -> x <= r.len)) AS DOUBLE) / size(ls) - r.cf)))"),
        6))
      .select(col("window.start").as("wstart"), col("n_docs"), col("ks"),
        (col("ks") >= threshold).as("drifted"))

  /** B107-streaming: TOKENIZER-FERTILITY drift monitor — the serving
    * twin of q168. Each hourly window's tokens-per-word per source
    * under the TRAINED unigram model: the stream's words join the
    * broadcast (word → n_pieces) table
    * ([[graft.ops.TextOps.unigramWordPieces]], distinct-clipped-word
    * grain — the model artifact a serving fleet ships); words the
    * trained vocabulary never saw fall back to character count (the
    * all-singles segmentation — the worst-case fertility, which is
    * exactly what makes OOV influx VISIBLE in this metric). A window
    * whose fertility exceeds the trained-corpus baseline by the
    * caller's margin flags `drifted` — the "this feed stopped looking
    * like the tokenizer's training corpus" alarm, fired within an
    * hour. State is the windowed aggregate only (two longs per
    * (window, source)); the model side is a broadcast, so the monitor
    * scales exactly like the batch join. */
  def fertilityDriftMonitor(docs: DataFrame, wordPieces: DataFrame,
      baseline: Double, margin: Double): DataFrame =
    docs
      .withWatermark("ts", "10 minutes")
      .select(col("ts"), col("source"),
        explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .select(col("ts"), col("source"),
        substring(col("word"), 1, graft.ops.TextOps.UniClip).as("w"))
      .join(broadcast(wordPieces), Seq("w"), "left")
      .withColumn("np",
        coalesce(col("n_pieces"), length(col("w")).cast("long")))
      .groupBy(window(col("ts"), "1 hour"), col("source"))
      .agg(count(lit(1)).as("n_words"), sum(col("np")).as("n_tokens"))
      .withColumn("fertility",
        round(col("n_tokens").cast("double") / col("n_words"), 6))
      .select(col("window.start").as("wstart"), col("source"),
        col("n_words"), col("n_tokens"), col("fertility"),
        (col("fertility") - lit(baseline) >= lit(margin)).as("drifted"))

  /** B41 stream-stream: watermarked interval join — each click joins
    * the impression that preceded it by ≤ 30 minutes for the same
    * user (the attribution shape; q77's interval join is the batch
    * twin). BOTH sides carry watermarks and the join condition bounds
    * click_ts relative to imp_ts from both directions, so the state
    * store holds only impressions younger than watermark + 30 min and
    * clicks younger than watermark — bounded buffers on two unbounded
    * streams. Without the two-sided time bound Spark would rightly
    * refuse to plan it (unbounded state); the interval IS the
    * eviction policy. */
  def attributedClicks(impressions: DataFrame, clicks: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val i = impressions.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("imp_id"), col("user_id"),
        col("ts").as("imp_ts"))
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    // leftOuter adds the "impression never clicked" rows — but only
    // once the click-side watermark passes imp_ts + 30 min, because
    // until then a matching click can still arrive; the null-padded
    // row is the WATERMARK's statement that it cannot
    i.join(c,
        col("user_id") === col("c_user") &&
          col("click_ts") >= col("imp_ts") &&
          col("click_ts") <= col("imp_ts") + expr("interval 30 minutes"),
        joinType)
      .select(col("imp_id"), col("click_id"), col("user_id"),
        col("imp_ts"), col("click_ts"))
  }

  /** q198-streaming: the online phase of the sweep-line concurrency
    * analytic — per-hour net session deltas and edge counts from the
    * SAME ±1 endpoint construction the batch op uses
    * (WindowedOps.concurrencyDeltas, shared verbatim), watermarked so
    * an hour's net finalizes one hour after its last possible
    * endpoint. The bounded hour-grain prefix pass (each hour's opening
    * concurrency) stays a downstream batch step over these nets —
    * running totals across an unbounded stream are exactly what the
    * distributed decomposition keeps OUT of per-event state: the
    * stream maintains ≤ one (net, n_edges) pair per open hour. */
  def concurrencyHourlyNets(events: DataFrame): DataFrame =
    graft.ops.WindowedOps.concurrencyDeltas(events)
      .withWatermark("t", "1 hour")
      .groupBy(window(col("t"), "1 hour"))
      .agg(sum(col("delta")).as("net"), count(lit(1)).as("n_edges"))
      .select(col("window.start").as("hstart"), col("net"), col("n_edges"))

  /** A11-streaming: continuous import. Each micro-batch appends to the
    * RDBMS through the same batched JDBC writer the batch path uses —
    * the incremental-import story for a continuously-arriving dump
    * (exactly-once per batch id is the sink's job; Derby demo keeps it
    * at-least-once like the reference's resumable INSERTs). */
  def streamToJdbc(events: DataFrame, url: String, table: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ingest.Sinks.appendJdbc(batch.toDF(), url, table)
      }
      .start()

  /** A11-streaming upsert (VERDICT_r11 #8): continuous keyed import
    * with EXACTLY-ONCE table state. foreachBatch delivers each
    * micro-batch at-least-once (a crashed epoch replays); composing it
    * with the idempotent [[graft.ingest.Sinks.upsertJdbc]] makes the
    * replay invisible — the batch is deduped to one row per key
    * (last-in-batch wins by max event ordering, the q30 first/last
    * policy) and delete+insert of the same rows is a state no-op.
    * SinksSpec forces the retry: the same batch applied twice leaves
    * the table bit-identical. */
  def streamUpsertJdbc(events: DataFrame, url: String, table: String,
      keyCols: Seq[String], orderCol: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // tiebreak beyond orderCol with a content digest of the whole
        // row: two same-key rows with EQUAL orderCol values must
        // resolve to the same winner on every replay/retry, or the
        // exactly-once contract (same batch twice → bit-identical
        // table) silently breaks on ties
        val digest = org.apache.spark.sql.functions.xxhash64(
          batch.columns.map(col).toIndexedSeq: _*)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          .orderBy(col(orderCol).desc, digest.asc)
        val deduped = batch.toDF()
          .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        graft.ingest.Sinks.upsertJdbc(deduped, url, table, keyCols)
      }
      .start()

  /** B42: custom keyed state — running per-user event counts via
    * flatMapGroupsWithState (update mode). */
  def runningUserCounts(events: Dataset[Ev]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, UserCount](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + evs.size
          state.update(n)
          Iterator(UserCount(uid, n))
      }
  }

  /** B42 on the Spark 4 arbitrary-state API: the same running per-user
    * count as a `StatefulProcessor` with a typed `ValueState` —
    * transformWithState is the successor to flatMapGroupsWithState
    * (composable state variables, timers, TTL; RocksDB-backed state
    * store required). At 100 TB this is the preferred custom-state
    * operator: state lives off-heap per key group and TTLConfig bounds
    * it without hand-rolled timeout plumbing. */
  class RunningCountProcessor extends StatefulProcessor[Long, Ev, UserCount] {
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[UserCount] = {
      val n = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(n)
      Iterator.single(UserCount(uid, n))
    }
  }

  def runningUserCountsTws(events: Dataset[Ev]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningCountProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
