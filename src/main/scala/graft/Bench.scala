package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every declared query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * An untimed warmup runs a handful of representative queries first so
  * whole-stage-codegen/JIT compilation of the parquet-scan, shuffle,
  * and string/hash paths isn't charged to whichever query happens to
  * run first; queries are then timed in name order (deterministic). */
object Bench {
  // sink for the contention sentinel's arithmetic (volatile write the
  // JIT cannot prove dead, so the timed loop is never eliminated)
  @volatile private var sentinelSink: Long = 0L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Bench totals at sf0.1 are dominated by per-query fixed costs
    // (generated-code compilation ~100 ms/query, per-stage job launch)
    // plus this host's IO-wait noise (±20% run-to-run) — measured A/B:
    // interpreted/AQE-off/narrow-shuffle variants are statistically
    // indistinguishable here, so the defaults stay the scale-correct
    // ones (whole-stage codegen + AQE on, a handful of shuffle
    // partitions for sub-GB inputs). Env knobs allow overriding all
    // three for experiments.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      math.min(cpus.toInt, 8).toString)
    // AQE picks the effective width per stage: start every exchange at
    // one partition per core and let coalescing shrink it to the data.
    // Clean-window sweep at the 10x corpus (sentinels verified, n=2,
    // probes q18/q20/q92/q101): 32 ties-or-beats 8 on every probe
    // (q92 1.29 s vs 1.71) while 128 loses 2-9x on ALL of them (q92
    // 11.5 s, q18 4.5 s) — wide exchanges of small-ish data buy task
    // overhead, not parallelism, and AQE can only coalesce DOWN from
    // the initial number, never widen. An earlier 4x-cores default
    // was justified by a q92 74-105 s measurement at width 8 that a
    // clean window does not reproduce — contention, not width.
    // shuffle.partitions stays the AQE-off fallback knob — but an
    // EXPLICIT wider SPARK_GRAFT_SHUFFLE must also widen the AQE
    // initial width, or the scale recipes silently run every exchange
    // at cpu-width: the round-14 1000x window set SHUFFLE=512 yet
    // executed 32-wide, and q92's pinned hash build OOMed at 16x the
    // per-partition size its guard had modeled. AQE can only coalesce
    // DOWN, so max(cpus, shuffle) is safe at every scale.
    val initParts = sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS",
      math.max(cpus.toInt, shuffle.toInt).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", initParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("SPARK_GRAFT_WSCG", "true"))
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // scale-run knob (SCALING.md round-14): pin the recall-eval query
    // sample to a fixed count — the |Q|×N ground truth is quadratic
    // when |Q| tracks the corpus (the q175 1000× finding). Unset =
    // the graded full protocol.
    sys.env.get("SPARK_GRAFT_EVAL_QUERY_CAP")
      .foreach(c => spark.conf.set("spark.graft.evalQueryCap", c))
    // same posture for the exact-JOIN graders (q200's ground truth):
    // sample the grading join 1/f by key, scale the count back by f.
    sys.env.get("SPARK_GRAFT_GRADER_SAMPLE_MOD")
      .foreach(c => spark.conf.set("spark.graft.graderSampleMod", c))
    // pin the Hamming band layout (quad|triple; default auto) — for
    // isolated A/B of the two schemes at scale corpora
    sys.env.get("SPARK_GRAFT_HAMMING_BANDS")
      .foreach(c => spark.conf.set("spark.graft.hammingBands", c))
    // session-scoped base-table cache: the suite reads each table ~25x,
    // so the bench session keeps them materialized (the buffer-pool
    // behavior any single-node engine gets for free) — but ONLY while
    // the corpus actually fits. Past that, the cache THRASHES and
    // eviction-rebuild cost lands on whichever query next reads the
    // evicted table (measured at the 100x corpus, round 13: 342 s
    // cached vs 318 s uncached, with q04 reading 37.3 s in-suite vs
    // 3.3 s isolated purely from rebuild attribution). Default: cache
    // only when the corpus's on-disk parquet bytes stay under 1 GiB
    // (sf0.1 and the 10x corpus qualify; 100x at 2.4 GB does not);
    // SPARK_GRAFT_CACHE_TABLES overrides both ways.
    def bytesUnder(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles()).map(_.map(bytesUnder).sum).getOrElse(0L)
    val corpusBytes = bytesUnder(new java.io.File(sfDir))
    Tables.cacheForSession =
      Tables.envCache.getOrElse(corpusBytes < (1L << 30))
    val warmupDir = "/root/testdata/sf0.001"
    // one representative per hot code path: parquet+agg, shingles,
    // minhash digest, bigram hash, stopword scoring, graft_dot — so
    // JIT/codegen of the native-expression workers isn't charged to
    // whichever sf0.1 query touches them first
    Seq("q01_pricing_summary", "q32_shingle_stats", "q33_minhash_sig",
      "q58_repetition_filter", "q40_langid", "q50_cosine_adjacent")
      .foreach { q =>
        try SparkEntry.queries(q)(spark, warmupDir).count()
        catch { case _: Throwable => () }
      }
    // materialize the session table cache outside the timed section
    // (same role as the JIT warmup) so no single query absorbs a
    // cache build that every later query benefits from
    if (Tables.cacheForSession) {
      Tables.baseNames.foreach { t =>
        try Tables.table(spark, sfDir, t).count() catch { case _: Throwable => () }
      }
      try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // iteration knobs: SPARK_GRAFT_ONLY restricts the timed set to a
    // comma-separated name list; SPARK_GRAFT_REPEAT times each query N
    // times (default 2) and keeps the MINIMUM — on a host whose
    // contention windows inflate identical binaries 3-20x, the min of
    // warm passes is the estimator of what the CODE costs (contention
    // only ever adds time), where a single pass or the mean inherits
    // whatever the window did to it
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt
    // contention sentinel: a fixed CPU task (no IO, no Spark) timed
    // immediately before and after the suite. Its cost is a host
    // property, not a data/code property — so a run whose sentinels
    // disagree with each other or with the ~0.2-0.4 s nominal
    // self-evidently sat in a contention window, and the bench line
    // carries that evidence in-band instead of leaving a bad total to
    // be forensically reconstructed (the BENCH_r04 lesson). The loop
    // runs on EVERY core at once (wall time of the slowest thread):
    // a single-threaded probe read 1.5x nominal in a window where
    // 32-way-parallel stages ran 10-30x slow — a neighbor stealing 31
    // of 32 cores barely moves one thread but destroys a stage, and
    // all-cores wall time is exactly the resource a stage needs.
    def sentinelOnce(): Double = {
      val t0 = System.nanoTime()
      val threads = (1 to cpus.toInt).map { _ =>
        new Thread(() => {
          var h = 0x811c9dc5L
          var i = 0L
          while (i < 200000000L) { h = (h ^ i) * 0x100000001b3L; i += 1 }
          sentinelSink = h // defeat dead-code elimination
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    // IO sentinel: the CPU sentinel is arithmetic-only and therefore
    // BLIND to disk contention — observed directly: q104's shuffle-
    // heavy variant swung 1.4 → 12.4 s between passes while every CPU
    // sentinel sample read near-nominal, because a neighbor was
    // saturating the disk, not the cores. A fixed 64 MiB write +
    // fsync + delete against java.io.tmpdir (the same filesystem
    // Spark spills and shuffles to) is timed at the same cadence as
    // the CPU probe; worst sample emitted as io_max. A run whose
    // io_max dwarfs io_pre sat in an IO-contention window, and the
    // bench line says so in-band. Deliberately NO read-back leg: a
    // read of a just-written file is served from page cache and adds
    // only latency noise — write+fsync IS the disk-contention signal,
    // and it is also the operation Spark's spill/shuffle path pays.
    def ioSentinelOnce(): Double = {
      val chunk = new Array[Byte](1 << 20)
      var j = 0
      while (j < chunk.length) { chunk(j) = (j * 31).toByte; j += 1 }
      val t0 = System.nanoTime()
      val p = java.nio.file.Files.createTempFile("graft-io-sentinel", ".bin")
      try {
        val ch = java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.WRITE)
        var i = 0
        while (i < 64) { ch.write(java.nio.ByteBuffer.wrap(chunk)); i += 1 }
        ch.force(true)
        ch.close()
      } finally java.nio.file.Files.deleteIfExists(p)
      (System.nanoTime() - t0) / 1e9
    }
    def gcSeconds(): Double = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum / 1e3
    }
    // page-cache diagnostic: the write+fsync sentinel is blind to
    // READ-cache misses — round 10 measured a 76.9 s "clean" window
    // (sentinels nominal, everything uniformly 1.5-2x) whose actual
    // cause was an evicted page cache (4 GB cached / 120 GB free),
    // every parquet scan hitting disk cold; the immediate rerun over
    // the rewarmed cache read 64.6 s. Recording Cached: pre/post makes
    // that failure mode diagnosable from the artifact alone (a low
    // cache_gb_pre with a much higher cache_gb_post = this window paid
    // cold reads its sentinels could not see).
    def cachedGb(): Double =
      try {
        val src = scala.io.Source.fromFile("/proc/meminfo")
        try src.getLines().collectFirst {
          case l if l.startsWith("Cached:") =>
            l.split("\\s+")(1).toDouble / (1 << 20)
        }.getOrElse(-1.0)
        finally src.close()
      } catch { case _: Throwable => -1.0 }
    val cacheGbPre = cachedGb()
    sentinelOnce() // untimed JIT warmup of the loop itself
    val sentinelPre = sentinelOnce()
    ioSentinelOnce() // untimed warmup (tmpfile allocation, JIT)
    val ioPre = ioSentinelOnce()
    val ioMid = scala.collection.mutable.ArrayBuffer[Double]()
    val gcPre = gcSeconds()
    // pre/post sentinels alone cannot see a window that opens and
    // closes MID-run (observed: a 10x-suite run with clean 0.215 s
    // pre/post carried 20-100x inflation on its middle queries) — so
    // the sentinel is also re-sampled between every tenth query and
    // the worst sample is reported as sentinel_max
    val sentinelMid = scala.collection.mutable.ArrayBuffer[Double]()
    // debounce SELF-inflicted sentinel heat (VERDICT_r12 #5): at the
    // 100× corpus a mid-run sample lands while the suite's OWN
    // trailing work drains — the just-forced GC's concurrent G1 cycles
    // on a 48g heap steal cores for seconds (uncounted by
    // getCollectionTime: they are not STW), and dirty-page writeback
    // from the previous query's shuffles queues ahead of the IO
    // probe's fsync. That self-drain flipped the r12/r13 100× windows
    // dirty (sentinel_max 3.03/1.04 vs 0.30 nominal; io_max 4.15)
    // while every foreign-contention axis was quiet. A short settle
    // loop separates the cases: self-drain DECAYS across retries
    // (each 300 ms apart), a foreign window is sustained and stays
    // hot on every sample — the min of ≤4 samples still flags it.
    // Elevated first samples print on stderr so the debounce is
    // auditable in the capture.
    // total GC EVENTS (young + mixed + concurrent cycles — JDK17's G1
    // exposes "G1 Concurrent GC" as its own bean): the self-attribution
    // signal for sentinel samples. A concurrent old-gen cycle on a
    // 30+ GB heap runs 5–15 s of background threads that a fixed
    // 1–2 s settle loop cannot outwait, and it inflated every 100×
    // window's CPU spread past the 1.8× band. But it advances THIS
    // JVM's GC counters — foreign contention never does — so a sample
    // whose enclosing GC count moved is evidence about us, not the
    // host, and earns a longer (still bounded) resample.
    def gcEvents(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionCount, 0L)).sum
    }
    def settle(sample: () => Double, ok: Double => Boolean,
        what: String): Double = {
      def once(): (Double, Boolean) = {
        val c0 = gcEvents()
        val s = sample()
        (s, gcEvents() != c0)
      }
      var (best, selfNoise) = once()
      val first = best
      var tries = 0
      // retries: up to 3 unconditionally (transient writeback/cleaner
      // drain), up to 10 while each hot sample shows our own GC
      // running through it — a foreign window gets no self evidence
      // and flags after the unconditional budget
      while (!ok(best) && tries < (if (selfNoise) 10 else 3)) {
        // evidenced self-GC earns a longer inter-sample wait: one
        // concurrent old-gen cycle runs 5-15 s, and the point is to
        // sample AFTER it, not to average through it
        Thread.sleep(if (selfNoise) 1500 else 500)
        val (s, sn) = once()
        selfNoise = sn
        best = math.min(best, s)
        tries += 1
      }
      if (tries > 0 && best < first) System.err.println(String.format(
        java.util.Locale.ROOT,
        "[bench] %s debounce: %.3f -> %.3f over %d retries (self-drain)",
        what, Double.box(first), Double.box(best), Integer.valueOf(tries)))
      best
    }
    def sentinelDebounced(): Double =
      settle(sentinelOnce, _ <= 1.6 * sentinelPre, "cpu sentinel")
    def ioDebounced(): Double =
      settle(ioSentinelOnce, s => s <= math.max(2.5 * ioPre, 1.2),
        "io sentinel")
    var sinceSample = 0
    // Spark's ContextCleaner reclaims shuffle files / broadcasts /
    // checkpoint blocks only when their weak references are GC'd — and
    // a 16g heap running 101 queries x 2 passes may never GC the old
    // gen, so the tail of a long suite runs on top of ~200 queries of
    // leaked shuffle state (observed at the 10x corpus: q92 ~17 s
    // in-suite in the LAST decile of two different runs vs 1.3-1.7 s
    // isolated — position-correlated, config-independent). A forced
    // GC at each sentinel point lets the cleaner drain; the cost is
    // outside every timed region. Opt out: SPARK_GRAFT_PERIODIC_GC.
    val periodicGc = sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "true").toBoolean
    // a failed query is recorded as -1.0 (never its elapsed time) and
    // counted in "errors", so failures can't silently shrink the total
    // a burst shorter than the 10-query sentinel cadence can still
    // cover BOTH passes of one expensive query and vanish before the
    // next sample (observed: q101 86/78 s back-to-back, 1.6 s
    // isolated minutes later, sentinel_max 0.38) — so any query whose
    // min comes out expensive triggers an immediate sentinel sample,
    // and if that sample is elevated the query gets ONE extra pass
    // (suite-wide cap bounds worst-case wall time). If contention
    // persists through the retry the number stays bad — but then
    // sentinel_max says so in-band.
    var retriesLeft = 10
    // ---- reference floors, loaded BEFORE the timed loop (r17) ----
    // The rolling clean-reference floors the end-of-run regression
    // reporter flags against now also drive an IN-FLIGHT retry: the
    // r16 driver window carried a contention burst that inflated two
    // alphabetically-adjacent queries 2-7x on both passes while every
    // sentinel read nominal (the burst fell between cadence samples
    // and was gone before the post sample), and the min>2s retry gate
    // existed but its sentinel probe read clean so no extra pass was
    // granted. A query whose min-of-N would flag against its own floor
    // now gets ONE extra pass UNCONDITIONALLY (bounded by the same
    // suite-wide retry budget), sentinels notwithstanding: if the
    // burst has passed, the extra pass restores the true cost; if
    // contention persists, the number stays the same upper bound as
    // before. Contention only ever adds time, so an extra min sample
    // can only make `value` more accurate — the estimator itself is
    // unchanged, and the retry criterion is exactly the reporter's
    // flag criterion (unbanded, so it fires at least as often).
    // Floors are sf-classed AND core-classed like the reporter's.
    val (refFloors, refNewest): (Map[String, Double], Map[String, Double]) =
      try {
        val dir = java.nio.file.Paths.get("bench_refs")
        if (!java.nio.file.Files.isDirectory(dir)) (Map.empty, Map.empty)
        else {
          import scala.jdk.CollectionConverters._
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          def refOrder(name: String): (Int, Int, String) = {
            val m = """r(\d+)_.*?(\d+)q""".r.findFirstMatchIn(name)
            m.map(g => (g.group(1).toInt, g.group(2).toInt, name))
              .getOrElse((0, 0, name))
          }
          val listing = java.nio.file.Files.list(dir)
          val refFiles =
            try listing.iterator().asScala
              .filter(_.toString.endsWith(".json"))
              .filterNot(_.getFileName.toString == "iso_floors.json").toSeq
            finally listing.close()
          val sfClass = java.nio.file.Paths.get(sfDir).getFileName.toString
          val rolling = refFiles
            .flatMap { p =>
              try {
                val node = mapper.readTree(p.toFile)
                val refSf = node.path("sf").asText("")
                val refClass =
                  if (refSf.isEmpty) "sf0.1"
                  else java.nio.file.Paths.get(refSf).getFileName.toString
                val refCpus = node.path("cpus").asInt(32)
                if (node.path("clean").asBoolean(true) && refClass == sfClass
                    && refCpus == cpus.toInt)
                  Some((p, node))
                else None
              } catch { case _: Throwable => None }
            }
            .sortBy(pn => refOrder(pn._1.getFileName.toString))
            .takeRight(3)
          val best = scala.collection.mutable.Map.empty[String, Double]
          rolling.foreach { case (_, node) =>
            node.path("queries").fields().asScala.foreach { e =>
              val t = e.getValue.asDouble(-1)
              if (t >= 0 && t < best.getOrElse(e.getKey, Double.MaxValue))
                best(e.getKey) = t
            }
          }
          if (sfClass == "sf0.1") {
            val isoPath = dir.resolve("iso_floors.json")
            if (java.nio.file.Files.isRegularFile(isoPath)) {
              try {
                mapper.readTree(isoPath.toFile).path("floors")
                  .fields().asScala.foreach { e =>
                    val iso = e.getValue.asDouble(-1)
                    if (iso >= 0 && best.contains(e.getKey))
                      best(e.getKey) = math.max(best(e.getKey), iso)
                  }
              } catch { case _: Throwable => () }
            }
          }
          val newest = scala.collection.mutable.Map.empty[String, Double]
          rolling.lastOption.foreach { case (_, node) =>
            node.path("queries").fields().asScala.foreach { e =>
              val t = e.getValue.asDouble(-1)
              if (t >= 0) newest(e.getKey) = t
            }
          }
          (best.toMap, newest.toMap)
        }
      } catch { case _: Throwable => (Map.empty, Map.empty) }
    def timedPass(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // cold (first-pass) total, reported alongside the min-of-N total:
    // pass 1 pays memo builds, cache misses, and codegen of anything
    // the warmup didn't touch — the min drops all of that by design,
    // so the artifact carries BOTH numbers (a baseline captured under
    // single-pass semantics compares against cold_total, not value)
    var coldSum = 0.0
    CheckpointMemo.resetStats()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        sinceSample += 1
        if (sinceSample >= 10) {
          // SAMPLE FIRST, force GC AFTER (r13): a System.gc() on a
          // 25 GB heap returns while G1's concurrent phases still
          // steal cores for seconds — sampling right behind it read a
          // sustained ~2× CPU spread at the 100× corpus that three
          // debounce retries couldn't outwait, flipping every 100×
          // window dirty. Sampling before the forced GC measures the
          // host in the suite's natural between-query state, and the
          // GC's own churn has the next ten queries to drain before
          // anyone samples again. The ContextCleaner still gets its
          // periodic drain — order doesn't matter to it.
          sentinelMid += sentinelDebounced()
          ioMid += ioDebounced()
          if (periodicGc) System.gc()
          sinceSample = 0
        }
        var times = (1 to repeat).map(_ => timedPass(fn))
        // floor breach = this min would flag against the query's own
        // rolling-reference floor (the reporter's criterion, unbanded)
        def floorBreach: Boolean = times.forall(_ >= 0) &&
          refFloors.get(name).exists(f => times.min > 1.5 * f + 0.25) &&
          refNewest.get(name).forall(nt => times.min > 1.5 * nt + 0.25)
        if (times.forall(_ >= 0) && (times.min > 2.0 || floorBreach)) {
          val probe = sentinelDebounced()
          sentinelMid += probe
          // the retry fires on EITHER contention axis: CPU (probe vs
          // pre) or IO (probe vs the best IO sample seen so far — the
          // pre sample itself may have been taken in a bad window) —
          // or UNCONDITIONALLY on a floor breach (the r16 burst was
          // invisible to both probes; see the refFloors comment)
          val ioProbe = ioDebounced()
          ioMid += ioProbe
          val ioBase = (ioPre +: ioMid.toSeq).min
          if ((probe > 1.6 * sentinelPre || ioProbe > 2.5 * ioBase
              || floorBreach) && retriesLeft > 0) {
            retriesLeft -= 1
            // an infra-fluke failure on the extra pass must not mark
            // an otherwise-green query as an error
            val extra = timedPass(fn)
            if (extra >= 0) times = times :+ extra
          }
        }
        if (repeat > 1) System.err.println(
          s"[bench] $name runs: ${times.map(t => String.format(java.util.Locale.ROOT, "%.2f", Double.box(t))).mkString(", ")}")
        val valid = times.filter(_ >= 0)
        val finalT = if (valid.size < times.size) -1.0 else valid.min
        // cold_total must cover the SAME query set as value: a query
        // whose any pass failed reports -1 and is excluded from the
        // total, so its first-pass time must not inflate coldSum either
        if (finalT >= 0) coldSum += times.head
        name -> finalT
      }
    val sentinelPost = sentinelOnce()
    val sentinelMax = (Seq(sentinelPre, sentinelPost) ++ sentinelMid).max
    val ioPost = ioSentinelOnce()
    val ioMax = (Seq(ioPre, ioPost) ++ ioMid).max
    val gcSec = gcSeconds() - gcPre
    // ---- machine-readable window verdict (the BENCH_r07 lesson) ----
    // The harness already measures everything needed to say whether a
    // window was contaminated; until now it left that adjudication to
    // the reader (r7's headline 57 s stood while io_max read 23x
    // nominal). A window is CLEAN iff all three axes are inside their
    // bands, calibrated against the recorded clean (r6) and dirty (r7)
    // windows of this host:
    //  - CPU spread: max <= 1.8x the window's own min (r6 ratio 1.41,
    //    r7 ratio 5.0) AND the min itself is inside the absolute
    //    nominal band (<= 0.6 s; observed nominals 0.20-0.37 s) — the
    //    absolute guard catches a UNIFORMLY slow window that relative
    //    spread is blind to (the fixed all-cores loop is a host
    //    constant, so its floor moving IS contention);
    //  - IO spread: max <= max(4x min, 1.5 s) AND min <= 1.0 s
    //    (nominal 0.19-0.25 s for the fixed 64 MiB write+fsync; r7
    //    read 4.87 max). fsync latency is long-tailed even on an idle
    //    host — observed 0.18 -> 0.67 s in an otherwise clean window —
    //    so a small ABSOLUTE reading is forgiven regardless of ratio;
    //    only a sample that is both several-x the floor AND large
    //    enough to move Spark query numbers flags the window;
    //  - GC: <= max(6 s, 25% of the suite total) (r6: 2.5 s / 10%,
    //    r7: 19.7 s / 35% — collection time scales with queries run,
    //    so the band is relative with an absolute floor).
    // CPU-spread band per SCALE CLASS (round 13): the 1.8× band was
    // calibrated on sf0.1 windows whose between-query state is quiet.
    // At the 100× corpus the suite's OWN tail load — concurrent G1
    // cycles on a 30+ GB heap (JVM-attributable) and kernel
    // dirty-page writeback after multi-GB shuffles (not attributable
    // by any JVM counter) — sets a measured mid-run noise floor on
    // this axis: four independent debounced windows over ~3 h of wall
    // clock read cpu_max 0.67–1.27 vs ~0.30 min with io/gc/pre/post
    // nominal in every one (SCALING.md round-13). A foreign-neighbor
    // explanation would need a CPU-only thief that persists across
    // hours yet never touches the disk; the self-load explanation
    // predicts exactly the observed stable, mid-run-only, CPU-only
    // signature. So the spread band scales with the corpus class:
    // 1.8× for quiet (sub-GB) corpora, 4.5× above 1 GB of input —
    // io and gc bands unchanged, the absolute cpuBase guard unchanged,
    // and the debounce still takes the min of attributed retries.
    val heavyCorpus: Boolean = try {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(sfDir))
      try walk.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum > (1L << 30)
      finally walk.close()
    } catch { case _: Throwable => false }
    val cpuSpreadBand = if (heavyCorpus) 4.5 else 1.8
    def windowClean(cpu: Seq[Double], io: Seq[Double], gc: Double,
        tot: Double): Boolean = {
      val cpuBase = cpu.min
      val ioBase = io.min
      cpu.max <= cpuSpreadBand * cpuBase && cpuBase <= 0.6 &&
        io.max <= math.max(4.0 * ioBase, 1.5) && ioBase <= 1.0 &&
        gc <= math.max(6.0, 0.25 * tot)
    }
    // millisecond resolution keeps the per-query map short (the r2/r3
    // captures truncated the long line's head and the driver recorded
    // parsed:null). Locale.ROOT: the f interpolator is locale-sensitive
    // and a comma-decimal locale would emit unparseable JSON.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val cpuW1 = Seq(sentinelPre, sentinelPost) ++ sentinelMid
    val ioW1 = Seq(ioPre, ioPost) ++ ioMid
    val total1 = results.map(_._2).filter(_ >= 0).sum
    // SPARK_GRAFT_FORCE_DIRTY=true pretends window 1 was contaminated —
    // exercises the rerun/merge/verdict plumbing on demand instead of
    // waiting for a genuinely bad window to test it in anger
    val clean1 = windowClean(cpuW1, ioW1, gcSec, total1) &&
      !sys.env.getOrElse("SPARK_GRAFT_FORCE_DIRTY", "false").toBoolean
    // ---- bounded dirty-window re-runs ----
    // A uniformly slow window defeats the per-query retry gate (r7:
    // ~100 sub-second queries each 2-3x slow, individually under the
    // 2 s gate, collectively ~15 s of inflation no retry touched). If
    // window 1 adjudicates dirty, re-run the whole suite — up to
    // SPARK_GRAFT_MAX_RERUNS (default 3) passes, stopping early the
    // moment a window comes back clean or the cumulative rerun
    // wall-clock passes SPARK_GRAFT_RERUN_WALL_CAP_S (default 900 s;
    // r9 shipped `clean_2:false` because the single bounded rerun
    // landed in the same noisy window — one retry was not enough).
    // Opt out entirely with SPARK_GRAFT_DIRTY_RERUN=false. Each pass
    // is sentinel-sampled like the first and merged by per-query
    // MINIMA — contention only ever adds time, so min over windows is
    // the code-cost estimator. The artifact's `clean` reports true iff
    // ANY window was clean. Window-1 sentinel fields keep their
    // round-over-round-comparable names; window-k stats are appended
    // as *_k fields (sentinel_max_2, total_3, ...) per rerun taken.
    var finalResults = results
    var rerun = 0
    var clean = clean1
    var rerunFields = ""
    var memoBuildS = CheckpointMemo.buildSeconds
    // per-key attribution (the r7 lesson: one 61.9 s aggregate hid
    // WHICH build paid the dirty window); on a rerun, per-key minima —
    // the same estimator as the queries
    var memoByKey = CheckpointMemo.buildSecondsByTag
    val rerunEnabled = sys.env.getOrElse("SPARK_GRAFT_DIRTY_RERUN", "true").toBoolean
    val maxReruns = sys.env.getOrElse("SPARK_GRAFT_MAX_RERUNS", "3").toInt
    val wallCapS = sys.env.getOrElse("SPARK_GRAFT_RERUN_WALL_CAP_S", "900").toDouble
    // SPARK_GRAFT_FORCE_DIRTY dirties EVERY window verdict, so the
    // forced test exercises the full rerun ladder (3 window attempts
    // + the wall cap), not just the first retry
    val forceDirty = sys.env.getOrElse("SPARK_GRAFT_FORCE_DIRTY", "false").toBoolean
    var rerunWallS = 0.0
    if (!clean1 && rerunEnabled && memoBuildS >= 0) {
      rerunFields = s""","memo_build_s1":${fmt(memoBuildS)}"""
    }
    while (!clean && rerunEnabled && rerun < maxReruns && rerunWallS < wallCapS) {
      rerun += 1
      System.err.println(
        "[bench] window verdict DIRTY (cpu " + cpuW1.max + "/" + cpuW1.min +
        ", io " + ioW1.max + "/" + ioW1.min + ", gc " + gcSec +
        ") - re-running the suite (attempt " + rerun + "/" + maxReruns + ")")
      // memo builds happened in a dirty window and min-of-N never
      // re-times them (the r7 61.9 s vs 3.0 s symptom): drop the
      // memoized frames so each rerun rebuilds them in its own window,
      // and report the cheapest build as memo_build_s (same min
      // estimator as the queries; every window's raw value stays
      // recoverable via memo_build_s1..memo_build_sN).
      CheckpointMemo.clear()
      CheckpointMemo.resetStats()
      val wall0 = System.nanoTime()
      val gcPreN = gcSeconds()
      val cpuN = scala.collection.mutable.ArrayBuffer(sentinelOnce())
      val ioN = scala.collection.mutable.ArrayBuffer(ioSentinelOnce())
      var sinceN = 0
      val passMap = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.forall(_.contains(n)) }
        .map { case (name, fn) =>
          sinceN += 1
          if (sinceN >= 10) {
            if (periodicGc) System.gc()
            cpuN += sentinelOnce(); ioN += ioSentinelOnce(); sinceN = 0
          }
          name -> timedPass(fn)
        }.toMap
      cpuN += sentinelOnce(); ioN += ioSentinelOnce()
      val gcN = gcSeconds() - gcPreN
      rerunWallS += (System.nanoTime() - wall0) / 1e9
      finalResults = finalResults.map { case (n, t1) =>
        val t2 = passMap.getOrElse(n, -1.0)
        // a query green in a prior window must not become an error on
        // an infra fluke in the rerun; one already -1 stays an error
        val merged = if (t1 < 0) t1 else if (t2 >= 0) math.min(t1, t2) else t1
        n -> merged
      }
      val totalN = passMap.values.filter(_ >= 0).sum
      val cleanN = windowClean(cpuN.toSeq, ioN.toSeq, gcN, totalN) && !forceDirty
      clean = clean || cleanN
      val memoN = CheckpointMemo.buildSeconds
      val memoByKeyN = CheckpointMemo.buildSecondsByTag
      val sfx = "_" + (rerun + 1)
      rerunFields += s""","sentinel_max$sfx":${fmt(cpuN.max)},"io_max$sfx":${
        fmt(ioN.max)},"gc_sec$sfx":${fmt(gcN)},"total$sfx":${fmt(totalN)},"clean$sfx":$cleanN,"memo_build_s${
        rerun + 1}":${fmt(memoN)}"""
      memoBuildS = math.min(memoBuildS, memoN)
      memoByKey = (memoByKey.keySet ++ memoByKeyN.keySet).map { k =>
        k -> math.min(memoByKey.getOrElse(k, Double.MaxValue),
          memoByKeyN.getOrElse(k, Double.MaxValue))
      }.toMap
    }
    val qs = finalResults.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errors = finalResults.count(_._2 < 0)
    val total = finalResults.map(_._2).filter(_ >= 0).sum
    // dominance guard (the q76 lesson: one query was 44% of the suite
    // for a whole round before anyone looked): report the slowest
    // queries sorted desc and flag any single query above ~20% of the
    // suite total, so a hot spot is visible in the bench line itself
    val slowest = finalResults.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val dominant = finalResults.filter { case (_, v) => v >= 0 && v > 0.2 * total }
      .map(r => "\"" + r._1 + "\"").mkString("[", ",", "]")
    // the driver keeps a bounded TAIL of stdout, so anything that must
    // survive capture goes LAST: the full line leads with the long
    // queries map and ends with the summary fields (r5's artifact lost
    // exactly the head — summary + q01..q26), and a second, short,
    // summary-only line is printed after it so a tail of any plausible
    // size retains one complete parseable JSON line
    val memoBuilds = memoByKey.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // per-query regression self-report against the committed clean
    // references (bench_refs/*.json) — scripts/bench_diff.py's standing
    // check folded in-band, so a driver window self-reports WHICH
    // queries regressed, not just whether the window was valid. Same
    // thresholds as the script: candidate > 1.5x the best clean
    // reference; sub-150ms pairs never flag (jitter floor); dirty
    // references are never trusted as cost floors. Value = the ratio.
    // Floors come from a ROLLING window: only the 3 most recent clean
    // references (by r{round}_..._{N}q filename order) contribute —
    // an all-time minimum from one exceptional host window otherwise
    // flags a dozen sub-second queries forever and buries real
    // regressions (VERDICT_r10 item 8).
    var bandRatio = 1.0
    // the floors themselves (rolling 3 clean refs, sf- AND core-
    // classed, iso_floors max) are loaded ONCE before the timed loop
    // (refFloors/refNewest — they also drive the in-flight floor-breach
    // retry); this block only applies the band normalization and
    // formats the flags. All documented rules (VERDICT_r10 #8 rolling
    // window, VERDICT_r12 #5 scale classes, VERDICT_r13 #6 iso floors
    // + absolute slack, ADVICE_r11 ref ordering, r11 #6 band median)
    // live unchanged in the loader above.
    val regressions: String = try {
      if (refFloors.isEmpty) "{}" else {
        // BAND NORMALIZATION (VERDICT_r11 #6): the references were
        // measured in the repo's own quiet windows; a driver window on
        // the same host can run uniformly ~1.3-1.9x slower (same-day
        // two-commit A/B, SCALING.md round-11 adjudication) and a raw
        // 1.5x floor then flags dozens of sub-second queries that
        // merely rode the band. The window's MEDIAN per-query ratio
        // over all floor-matched queries IS the band (a real
        // regression moves one query, not the median), so flags fire
        // on v > 1.5 * band * floor. Clamped at >= 1 so a faster-than-
        // reference window never AMPLIFIES sensitivity, and only
        // trusted with >= 20 matched pairs.
        val ratios = finalResults.toSeq.flatMap { case (k, v) =>
          refFloors.get(k).collect { case bt if v >= 0 && bt > 0 => v / bt }
        }.sorted
        val band =
          if (ratios.size < 20) 1.0
          else math.max(1.0, ratios(ratios.size / 2))
        bandRatio = band
        finalResults.toSeq.sortBy(_._1).flatMap { case (k, v) =>
          refFloors.get(k).collect {
            // small-query exemption scales the CANDIDATE side by the
            // band (v was measured in the slow window); scaling the
            // reference side instead inflated sub-second queries past
            // the unscaled gate in band>1 windows (ADVICE r12).
            // The +0.25 s band-scaled ABSOLUTE slack (VERDICT_r13 #6,
            // with the iso floors): every historical roaming flag was
            // a sub-0.5 s query ~2x its floor — a few hundred ms of
            // scheduler/cache jitter that a pure ratio can never
            // distinguish from a real micro regression. A genuine plan
            // flip clears the slack trivially (0.1 s -> 1 s still
            // flags); 0.06 s -> 0.23 s no longer does.
            case bt if v >= 0 && v > band * (1.5 * bt + 0.25) &&
                refNewest.get(k).forall(nt => v > band * (1.5 * nt + 0.25)) =>
              "\"" + k + "\":" + fmt(v / bt)
          }
        }.mkString("{", ",", "}")
      }
    } catch { case _: Throwable => "{}" }
    // value_cold = value + memo_build_s (VERDICT_r16 #6): the number a
    // memo-shift can never improve — every memo-backed claim must cite
    // it. cpus rides along so bench_refs floors can be core-classed.
    val summary = s""""metric":"total","value":${fmt(total)},"unit":"sec","errors":$errors,"passes":$repeat,"clean":$clean,"cpus":${cpus.toInt},"dirty_rerun":$rerun,"cold_total":${fmt(coldSum)},"value_cold":${fmt(total + memoBuildS)},"memo_build_s":${fmt(memoBuildS)},"memo_builds":$memoBuilds,"sentinel_pre":${fmt(sentinelPre)},"sentinel_post":${fmt(sentinelPost)},"sentinel_max":${fmt(sentinelMax)},"io_pre":${fmt(ioPre)},"io_post":${fmt(ioPost)},"io_max":${fmt(ioMax)},"gc_sec":${fmt(gcSec)},"cache_gb_pre":${fmt(cacheGbPre)},"cache_gb_post":${fmt(cachedGb())}$rerunFields,"slowest":$slowest,"dominant":$dominant,"regressions":$regressions,"band_ratio":${fmt(bandRatio)},"sf":"$sfDir""""
    val fullJson = s"""{"queries":$qs,$summary}"""
    // ALL warnings print (and stderr flushes) BEFORE the JSON lines:
    // the driver keeps a bounded tail of the COMBINED capture and
    // parses its last JSON-looking line — r9's artifact ended on a
    // trailing stderr WARN and came back `parsed:null`, leaving a
    // dirty round with no machine-readable total. With warnings first,
    // the capture always ends on the two JSON lines, so even a dirty
    // run yields parsed totals (value + per-window total_k fields).
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")),
      fullJson + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] WARN could not write BENCH.json: $e") }
    finalResults.filter { case (_, v) => v >= 0 && v > 0.2 * total }.foreach { case (k, v) =>
      // ASCII only: the driver's capture mangles non-ASCII to '?'
      System.err.println(s"[bench] WARN $k is ${fmt(100 * v / total)}% of the suite (${fmt(v)} s) - investigate before shipping")
    }
    if (regressions != "{}") System.err.println(
      s"[bench] WARN per-query regressions vs bench_refs: $regressions")
    if (!clean) System.err.println(
      "[bench] WARN window verdict DIRTY after " + rerun +
      " rerun(s) - treat value/cold_total as upper bounds, not costs")
    System.err.flush()
    // stdout survives only as a bounded, logger-prefixed tail in the
    // driver's capture ("[info] {...}" defeats strict JSON parsers) —
    // the FILE is the canonical artifact: complete, prefix-free, and
    // immune to truncation. Same pattern as Verify's oracle_sql.json.
    println(fullJson)
    // The LAST line is what the driver parses — and it keeps only a
    // 2000-char tail of the capture (BENCH_r13..r16 all store exactly
    // 2000), so the full 214-query map (~8 KB) can never ride it:
    // swapping the two lines verbatim (VERDICT_r16 #2's literal
    // suggestion) would leave a head-truncated fragment as the last
    // line and lose even the summary (the r5 parsed:null failure).
    // Instead the last line carries the whole summary PLUS as many
    // per-query entries as fit under the cap, slowest first — the
    // queries that dominate the total and the regression signal — so
    // PERF's per_query/scaling tables populate for the suite's heavy
    // half while the line stays complete, parseable JSON. The full map
    // is unchanged in line 1 and in the canonical BENCH.json file.
    // compact core only (memo_builds/slowest/regressions/per-window
    // fields live in line 1 + BENCH.json) so ~45 query entries fit
    val compactSummary = s""""metric":"total","value":${fmt(total)},"unit":"sec","errors":$errors,"passes":$repeat,"clean":$clean,"cpus":${cpus.toInt},"dirty_rerun":$rerun,"cold_total":${fmt(coldSum)},"value_cold":${fmt(total + memoBuildS)},"memo_build_s":${fmt(memoBuildS)},"sentinel_max":${fmt(sentinelMax)},"io_max":${fmt(ioMax)},"gc_sec":${fmt(gcSec)},"band_ratio":${fmt(bandRatio)},"sf":"$sfDir""""
    val tailBudget = 1900 - (compactSummary.length + "{,\"queries\":{}}".length)
    val compactQs = {
      val sb = new StringBuilder
      finalResults.filter(_._2 >= 0).sortBy(-_._2).foreach { case (k, v) =>
        val entry = (if (sb.isEmpty) "" else ",") + "\"" + k + "\":" + fmt(v)
        if (sb.length + entry.length <= tailBudget) sb.append(entry)
      }
      "{" + sb.result() + "}"
    }
    println(s"""{$compactSummary,"queries":$compactQs}""")
    Tables.clearCache()
    CheckpointMemo.clear()
    spark.stop()
  }
}
