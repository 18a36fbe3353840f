package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 similarity/quality/mixing additions: winnowing fingerprints
  * (q119/q120), the TF-IDF shingle cosine join (q121), the
  * integer-entropy gate (q122), and temperature language mixing
  * (q117).
  *
  * The winnowing tests chain two facts: (1) the operator's fingerprint
  * sets equal an independent in-memory reimplementation of the
  * SIGMOD'03 definition, and (2) that definition carries the scheme's
  * guarantee — any shared token run of length ≥ w + k − 1 contributes
  * a common fingerprint — demonstrated on spliced corpus texts. */
class WinnowingSpec extends AnyFunSuite with LocalSparkSuite {

  private val K = 3
  private val W = 4

  /** Reference winnowing in plain Scala: md5-hex each token k-gram,
    * min per w-window, distinct. */
  private def winnowLocal(text: String): Set[String] = {
    val toks = text.split(" ", -1)
    if (toks.length < K + W - 1) Set.empty
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(s: String): String =
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val grams = toks.sliding(K).map(_.mkString(" ")).map(h).toVector
      grams.sliding(W).map(_.min).toSet
    }
  }

  test("q119 operator fingerprints = independent in-memory winnowing") {
    val got = graft.ops.TextOps.winnowFps(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expected = repTexts.map { case (id, t) => id -> winnowLocal(t) }
      .filter(_._2.nonEmpty)
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("winnowing guarantee: a planted shared run of w+k-1 tokens yields a common fingerprint") {
    val texts = Tables.documents(spark, sfDir)
      .orderBy(col("doc_id")).limit(40).collect().map(_.getString(1))
    // splice the first w+k-1 tokens of doc i into the middle of doc i+20
    (0 until 20).foreach { i =>
      val run = texts(i).split(" ").take(K + W - 1)
      assume(run.length == K + W - 1)
      val host = texts(i + 20).split(" ")
      val spliced = (host.take(10) ++ run ++ host.drop(10)).mkString(" ")
      assert(winnowLocal(texts(i)).intersect(winnowLocal(spliced)).nonEmpty,
        s"splice $i lost the guaranteed fingerprint")
    }
  }

  private def corpusTexts: Map[Long, String] =
    Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap

  // one rep per distinct text — the q104-family precondition the
  // winnow/tfidf operators share
  private def repTexts: Map[Long, String] =
    corpusTexts.groupBy(_._2).map { case (t, m) => m.keys.min -> t }

  test("q120 = independent in-memory overlap (df cap, shared gate, containment) exactly") {
    val fps = repTexts.map { case (id, t) => id -> winnowLocal(t) }
      .filter(_._2.nonEmpty)
    val df = fps.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).map { case (fp, v) => fp -> v.map(_._2).toSet }
    val kept = df.filter(_._2.size <= 50)
    val expected = kept.values.toSeq
      .flatMap(docs => docs.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, v) => p -> v.size.toLong }
      .filter(_._2 >= 3)
      .map { case ((a, b), shared) =>
        (a, b) -> (shared, fps(a).size.toLong, fps(b).size.toLong,
          shared.toDouble / math.min(fps(a).size, fps(b).size))
      }
    val got = graft.ops.TextOps.winnowOverlap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got === expected)
    assert(expected.nonEmpty, "fixture corpus should contain overlapping pairs")
    assert(expected.values.exists(_._4 == 1.0), "near-dup pairs should reach containment 1.0")
  }

  test("q121 = independent in-memory TF-IDF cosine (integer weights) exactly") {
    val texts = repTexts
    val n = texts.size.toLong
    val tf = texts.collect { case (id, t) if t.split(" ", -1).length >= 3 =>
      id -> t.split(" ", -1).sliding(3).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (s, v) => s -> v.size.toLong }
    }
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (s, v) => s -> v.size.toLong }.filter(_._2 <= 50)
    val wt = tf.map { case (id, m) =>
      id -> m.collect { case (s, c) if df.contains(s) => s -> c * ((n * 100) / df(s)) }
    }.filter(_._2.nonEmpty)
    val norm2 = wt.map { case (id, m) => id -> m.values.map(w => w * w).sum }
    val ids = wt.keys.toSeq.sorted
    val expected = (for {
      i <- ids.iterator; j <- ids.iterator if i < j
      shareTerms = wt(i).keySet.intersect(wt(j).keySet) if shareTerms.size >= 3
      dot = shareTerms.toSeq.map(s => wt(i)(s) * wt(j)(s)).sum
      cos = dot.toDouble / (math.sqrt(norm2(i).toDouble) * math.sqrt(norm2(j).toDouble))
      if cos >= 0.6
    } yield (i, j) -> ((shareTerms.size.toLong, dot, cos))).toMap
    val got = graft.ops.TextOps.tfidfCosineJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === expected)
    assert(expected.nonEmpty)
    assert(expected.values.forall(_._3 <= 1.0 + 1e-9))
  }

  test("q122 integer entropy: single-char text scores 0 bits ('low'), uniform text log2(n) bits") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaaaaaaa"),          // 1 distinct char → surprisal 0
      (2L, "abcdefgh"),          // 8 distinct chars, each once → 3 bits/char
      (3L, "abababab")           // 2 chars → 1 bit/char
    ).toDF("doc_id", "text")
    val out = graft.ops.TextOps.entropyCore(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3), r.getString(4))).toMap
    assert(out(1L) === ((0L, 0.0, "low")))
    assert(out(2L) === ((24L, 3.0, "low")))
    assert(out(3L) === ((8L, 1.0, "low")))
    // corpus text is natural-ish: every doc gates 'ok' band or above 3 bits
    val corpus = graft.ops.TextOps.entropyGate(spark, sfDir).collect()
    assert(corpus.forall(_.getDouble(3) > 3.0))
  }

  test("q123 = independent in-memory sorted-neighborhood (blocked sort, w=3, lev<=30)") {
    def lev(a: String, b: String): Int = {
      val prev = Array.range(0, b.length + 1)
      for (i <- 1 to a.length) {
        var diag = prev(0); prev(0) = i
        for (j <- 1 to b.length) {
          val t = prev(j)
          prev(j) = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
            diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          diag = t
        }
      }
      prev(b.length)
    }
    val rows = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = rows.groupBy(_._2).values.flatMap { block =>
      val sorted = block.map { case (id, _, t) => (id, t.take(40), t.take(100)) }
        .sortBy(r => (r._2, r._1))
      (1 to 2).flatMap { o =>
        sorted.zip(sorted.drop(o)).map { case ((ia, _, ha), (ib, _, hb)) =>
          (math.min(ia, ib), math.max(ia, ib)) -> lev(ha, hb)
        }
      }
    }.filter(_._2 <= 30).toMap
    val got = graft.ops.CurationOps.sortedNeighborhood(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got === expected)
    assert(expected.nonEmpty, "fixture corpus should contain sort-adjacent near-dups")
  }

  test("q124 delta gate: every flagged new doc genuinely shares a band or chunk with the old half") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def rot(s: String, i: Int): String = s.substring(2 * i) + s.substring(0, 2 * i)
    val texts = corpusTexts
    val isOld = texts.keys.map(id => id -> (h(s"delta:$id")(0) <= '7')).toMap
    def bands(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Set.empty
      else {
        val hs = toks.sliding(3).map(g => h(g.mkString(" "))).toVector
        val mh = (0 until 4).map(i => hs.map(rot(_, i)).min)
        Set(mh(0) + mh(1), mh(2) + mh(3))
      }
    }
    def chunks(t: String): Set[String] =
      t.split(" ", -1).grouped(32).map(g => h(g.mkString(" "))).toSet
    val oldBands = texts.collect { case (id, t) if isOld(id) => bands(t) }.flatten.toSet
    val oldChunks = texts.collect { case (id, t) if isOld(id) => chunks(t) }.flatten.toSet
    val expected = texts.collect { case (id, t) if !isOld(id) =>
      val nd = bands(t).exists(oldBands)
      val cd = chunks(t).exists(oldChunks)
      id -> ((nd, cd, !(nd || cd)))
    }
    val got = graft.ops.TextOps.deltaDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got === expected)
    assert(expected.values.exists(_._1), "band channel should fire")
    assert(expected.values.exists(_._2), "chunk channel should fire")
    assert(expected.values.exists(_._3), "most new docs should be kept")
  }

  test("q125 packing report is consistent with the packed assignment") {
    val report = graft.ops.CurationOps.packingEfficiency(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    val packs = graft.ops.CurationOps.sequencePacking(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byLang = packs.groupBy(_._2)
    assert(report.keySet === byLang.keySet)
    byLang.foreach { case (lang, rows) =>
      val (nPacks, nDocs, nTok, minTok, maxTok, fill) = report(lang)
      val packTok = rows.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
      assert(nPacks === packTok.size.toLong)
      assert(nDocs === rows.size.toLong)
      assert(nTok === rows.map(_._4).sum)
      assert(minTok === packTok.values.min && maxTok === packTok.values.max)
      // every bin except possibly the last is within budget; fill rate
      // is exactly tokens over capacity
      assert(maxTok <= 512L)
      assert(fill === nTok.toDouble / (nPacks * 512L))
      assert(fill > 0.0 && fill <= 1.0)
    }
  }

  test("q128 composition respects each stage contract (kept ⊇ mixed ⊇ packed, quotas, budgets)") {
    val flags = graft.ops.TextOps.deltaDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val out = graft.ops.CurationOps.incrementalRefresh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // every packed doc survived the delta gate
    out.foreach { case (id, _, _, _) => assert(flags.get(id).contains(true)) }
    // packing: per (lang, pack) token sums within budget
    out.groupBy(r => (r._2, r._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sum <= 512L || rows.size == 1)
    }
    // mixing: selected count per lang == alpha quota over the SURVIVOR counts
    val survivors = flags.filter(_._2).keySet
    val langOf = Tables.documents(spark, sfDir).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nL = survivors.groupBy(langOf).view.mapValues(_.size.toLong).toMap
    val w = nL.view.mapValues(n => math.sqrt(n.toDouble * 1000000).floor.toLong).toMap
    val ww = w.values.sum
    val target = nL.values.sum / 2
    val quotas = w.view.mapValues(v => target * v / ww).toMap
    val keptPerLang = out.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(keptPerLang === quotas.filter(_._2 > 0))
  }

  test("q129 drift identities: union = old + new - retained, added/removed consistent") {
    // independent recomputation from raw texts
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(x: String): String =
      md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = rows.groupBy(_._2).map { case (src, docs) =>
      val (olds, news) = docs.partition { case (id, _, _) => h(s"delta:$id")(0) <= '7' }
      def chunks(ds: Seq[(Long, String, String)]): Set[String] =
        ds.flatMap(_._3.split(" ", -1).grouped(32).map(g => h(g.mkString(" ")))).toSet
      val (o, n) = (chunks(olds), chunks(news))
      src -> ((o.size.toLong, n.size.toLong, (n -- o).size.toLong,
        (o -- n).size.toLong, (o & n).size.toLong,
        1.0 - (o & n).size.toDouble / (o | n).size))
    }
    val got = graft.ops.TextOps.corpusDrift(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(got === expected)
    got.values.foreach { case (o, n, a, rm, rt, drift) =>
      assert(a === n - rt && rm === o - rt)
      assert(drift >= 0.0 && drift <= 1.0)
    }
  }

  test("q130 ensemble: percentiles span [0,1] per language, composite is the exact mean") {
    val rows = graft.ops.TextOps.qualityEnsemble(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, ps, pr, pe, q) =>
      assert(ps >= 0 && ps <= 1 && pr >= 0 && pr <= 1 && pe >= 0 && pe <= 1)
      assert(q === (ps + pr + pe) / 3.0)
    }
    rows.groupBy(_._2).foreach { case (lang, lr) =>
      assert(lr.map(_._3).min === 0.0 && lr.map(_._3).max === 1.0, s"p_stop span in $lang")
      assert(lr.map(_._5).min === 0.0 && lr.map(_._5).max === 1.0, s"p_ent span in $lang")
    }
  }

  // in-memory BPE reference, shared by the q132 tests: token-bigram
  // counts, and the token-grain left-to-right merge (only an exact
  // (a, b) token bigram merges — never a substring hit across token
  // boundaries — and a just-merged token leaves the window, so
  // "a a a" under "a a" becomes "a_a a")
  private def bigramCounts(ts: Iterable[String]): Map[String, Long] =
    ts.iterator.flatMap { t =>
      val tk = t.split(" ", -1)
      if (tk.length < 2) Iterator.empty
      else tk.sliding(2).map(_.mkString(" "))
    }.toSeq.groupBy(identity).map { case (p, v) => p -> v.size.toLong }

  private def mergeOne(t: String, pair: String): String = {
    val Array(a, b) = pair.split(" ", -1)
    val merged = pair.replace(' ', '_')
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    t.split(" ", -1).foreach { x =>
      if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = merged
      else out += x
    }
    out.mkString(" ")
  }

  test("q132 = independent in-memory BPE (3 greedy rounds, left-to-right merge)") {
    var texts = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val expected = (1 to 3).map { r =>
      val counts = bigramCounts(texts)
      // winner = max count, ties to the lexicographically SMALLEST
      // pair (the operator's ORDER BY cnt DESC, pair ASC LIMIT 1)
      val (pair, cnt) = counts.minBy { case (p, c) => (-c, p) }
      texts = texts.map(mergeOne(_, pair))
      (r, pair, cnt)
    }
    val got = graft.ops.TextOps.bpeMerges(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === expected)
    // merges are real: each winner count is positive and the merged
    // token never reappears as a pair member in an EARLIER round
    assert(expected.forall(_._3 > 0))
  }

  test("q132 merge fold is boundary-aware and resolves overlaps left-to-right") {
    import spark.implicits._
    // winner "a b" → merged "a_b": must NOT fire inside "za b" or
    // "a bz" (token boundaries), must fire on every exact bigram,
    // and "a a a" under winner "a a" keeps only the LEFT overlap
    val cases = Seq(
      ("x a b y", "a b", "x a_b y"),
      ("za b a bz a b", "a b", "za b a bz a_b"),
      ("a b a b", "a b", "a_b a_b"),
      ("a a a", "a a", "a_a a"),
      ("a a a a", "a a", "a_a a_a"),
      ("a", "a a", "a"),
      ("", "a b", ""))
    val got = cases.toDF("text", "pair", "want")
      .withColumn("a", element_at(split(col("pair"), " "), 1))
      .withColumn("b", element_at(split(col("pair"), " "), 2))
      .withColumn("m", regexp_replace(col("pair"), lit(" "), lit("_")))
      .select(col("text"), col("want"),
        expr(graft.ops.TextOps.bpeMergeFold).as("got"),
        graft.functions.GraftFunctions
          .bpeMergeFast(col("text"), col("pair")).as("native"))
      .collect()
    got.foreach { r =>
      assert(r.getString(2) === r.getString(1), s"fold of '${r.getString(0)}'")
      // the production-path native expression must agree with the
      // reference fold on every boundary case
      assert(r.getString(3) === r.getString(1), s"native of '${r.getString(0)}'")
    }
    // and the fold agrees with the in-memory reference on every case
    cases.foreach { case (t, p, want) => assert(mergeOne(t, p) === want) }
    // corpus-wide: native ≡ fold on every document under the real
    // round-1 winner (not just the crafted cases)
    val counts = bigramCounts(Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0)))
    val (winner, _) = counts.minBy { case (p2, c) => (-c, p2) }
    val diff = Tables.documents(spark, sfDir)
      .withColumn("pair", lit(winner))
      .withColumn("a", element_at(split(col("pair"), " "), 1))
      .withColumn("b", element_at(split(col("pair"), " "), 2))
      .withColumn("m", regexp_replace(col("pair"), lit(" "), lit("_")))
      .filter(graft.functions.GraftFunctions
        .bpeMergeFast(col("text"), col("pair")) =!= expr(graft.ops.TextOps.bpeMergeFold))
      .count()
    assert(diff === 0L, "native merge diverged from the fold on the corpus")
  }

  test("q132 delta round ≡ full second pass (incremental pair-count maintenance)") {
    val texts = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val c1 = bigramCounts(texts)
    val (pair, _) = c1.minBy { case (p, c) => (-c, p) }
    val full2 = bigramCounts(texts.map(mergeOne(_, pair)))
    val delta = graft.ops.TextOps.bpeDeltaCounts(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(delta === full2)
    // the pass-cost ratio the delta formulation buys: only docs
    // containing the winning bigram are rescanned (recorded in
    // SCALING.md from this measurement)
    val affected = texts.count(t =>
      t.split(" ", -1).length >= 2 &&
        t.split(" ", -1).sliding(2).exists(_.mkString(" ") == pair))
    info(s"delta round rescans $affected/${texts.length} docs " +
      f"(${affected * 100.0 / texts.length}%.1f%%)")
    assert(affected < texts.length, "the gate must exclude some docs")
  }

  test("q153 trainer: 60 delta-maintained rounds ≡ the full greedy recount at every round") {
    // local reference: plain greedy BPE, full recount per round
    var texts = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0)).toSeq
    val expected = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    (1 to 60).foreach { r =>
      val c = bigramCounts(texts)
      if (c.nonEmpty) {
        val (pair, cnt) = c.minBy { case (p, n) => (-n, p) }
        expected += ((r.toLong, pair, cnt))
        texts = texts.map(mergeOne(_, pair))
      }
    }
    val stats = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Long)]()
    val (merges, finalDocs, finalCounts) =
      graft.ops.TextOps.bpeTrainLoop(spark, sfDir, 60, Some(stats))
    val got = merges.orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // every round's winner AND its count match the full recount — the
    // delta maintenance never drifted across 60 rounds
    assert(got === expected.toSeq)
    // the maintained table at round 60 IS the recount of the rewritten
    // corpus (the round-N identity, directly)
    val maintained = finalCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val recount = finalDocs.collect().map(_.getString(0))
      .foldLeft(Map.empty[String, Long]) { (m, t) =>
        val tk = t.split(" ", -1)
        if (tk.length < 2) m
        else tk.sliding(2).foldLeft(m)((mm, p) =>
          mm.updated(p.mkString(" "), mm.getOrElse(p.mkString(" "), 0L) + 1L))
      }
    assert(maintained === recount)
    // cost curve: the affected fraction decays as merges specialize
    // (SCALING.md records this measurement)
    val n = Tables.documents(spark, sfDir).count()
    val firstHalf = stats.take(30).map(_._4).sum / 30.0
    val secondHalf = stats.drop(30).map(_._4).sum / 30.0
    info(f"affected docs/round: rounds 1-30 avg $firstHalf%.1f, 31-60 avg $secondHalf%.1f of $n")
    info("per-round (round, affected, wall ms): " +
      stats.map(t => s"(${t._1},${t._4},${t._5})").mkString(" "))
    assert(secondHalf < firstHalf,
      "later merges must touch fewer docs than early ones")
    assert(stats.last._4 < n, "the gate must exclude some docs")
  }

  test("q133 survivor is the quality argmax of its cluster; the policy genuinely differs from min-id") {
    val quality = graft.ops.TextOps.qualityEnsemble(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    val clusters = graft.ops.TextOps.dedupComponents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val got = graft.ops.TextOps.survivorPolicy(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet === byCluster.keySet)
    byCluster.foreach { case (c, members) =>
      val (n, minDoc, survivor, sq) = got(c)
      assert(n === members.length.toLong && minDoc === members.min)
      val best = members.minBy(id => (-quality(id), id))
      assert(survivor === best && sq === quality(best))
    }
    assert(got.exists { case (_, (_, minDoc, survivor, _)) => survivor != minDoc },
      "the quality policy should disagree with min-id somewhere")
  }

  test("q117 temperature mixing fills every quota exactly and flattens the head language") {
    val out = graft.ops.CurationOps.temperatureMix(spark, sfDir)
    val kept = out.groupBy(col("lang"))
      .agg(count(lit(1)).as("kept"), max(col("quota")).as("quota"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    kept.foreach { case (l, (k, q)) => assert(k === q, s"lang $l kept $k != quota $q") }
    val raw = Tables.documents(spark, sfDir).groupBy(col("lang"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rawTotal = raw.values.sum.toDouble
    val keptTotal = kept.values.map(_._1).sum.toDouble
    val head = raw.maxBy(_._2)._1
    assert(kept(head)._1 / keptTotal < raw(head) / rawTotal,
      "alpha=1/2 must shrink the head language's share")
    val tail = raw.minBy(_._2)._1
    assert(kept(tail)._1 / keptTotal > raw(tail) / rawTotal,
      "alpha=1/2 must grow the tail language's share")
  }
}
