package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CurationOps, StatsOps, TextOps}

/** Independent-reimplementation checks for the round-9 corpus-signal
  * layer (q138–q142): each test recomputes the operator's answer from
  * the raw corpus with plain Scala collections (a different algorithm
  * and engine from both Spark and the DuckDB oracle) and requires
  * equality — plus the structural invariants the hash-match can't
  * state (monotonicity, tie-outs across queries). */
class CorpusSignalsSpec extends AnyFunSuite with LocalSparkSuite {

  private def docs(): Seq[(Long, String, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("q139: island-merged duplicate coverage equals brute force") {
    val corpus = docs()
    // brute force: count every 5-gram occurrence, mark spans of grams
    // seen >1 time anywhere, merge overlapping spans per doc
    val gramCount = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val positions = corpus.map { case (id, _, text) =>
      val tk = text.split(" ")
      val grams = (0 to tk.length - 5).map(i => tk.slice(i, i + 5).mkString(" "))
      grams.foreach(g => gramCount(g) += 1)
      (id, tk.length, grams)
    }
    val expected = positions.map { case (id, n, grams) =>
      val spans = grams.zipWithIndex.collect {
        case (g, i) if gramCount(g) > 1 => (i, i + 4)
      }
      var covered = 0
      var curS = -1; var curE = -2
      spans.foreach { case (s, e) =>
        if (s > curE + 1 && curE >= 0) { covered += curE - curS + 1; curS = s; curE = e }
        else if (curE < 0) { curS = s; curE = e }
        else curE = math.max(curE, e)
      }
      if (curE >= 0) covered += curE - curS + 1
      id -> ((n.toLong, covered.toLong))
    }.toMap
    val out = TextOps.dupSpanCoverage(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet === expected.keySet)
    expected.foreach { case (id, (n, cov)) =>
      assert(out(id) === ((n, cov)), s"doc $id")
    }
    // islands never cover more than the doc
    assert(expected.forall { case (_, (n, cov)) => cov <= n })
  }

  test("q138: encode totals tie out against the corpus and the merge table") {
    val out = TextOps.bpeEncode(spark, sfDir).collect()
    val totalBefore = out.map(_.getLong(2)).sum
    val totalAfter = out.map(_.getLong(3)).sum
    val corpusTokens = docs().map(_._3.split(" ").length.toLong).sum
    assert(totalBefore === corpusTokens)
    // each merge event removes exactly one token; left-to-right overlap
    // resolution means events ≤ the winner's pre-merge pair count
    val winnersCnt = TextOps.bpeMerges(spark, sfDir).collect().map(_.getLong(2)).sum
    assert(totalAfter < totalBefore)
    assert(totalBefore - totalAfter <= winnersCnt)
    out.foreach { r =>
      val c = r.getDouble(4)
      assert(c > 0.0 && c <= 1.0, s"compression $c out of range for ${r.getString(0)}")
    }
  }

  test("q140: DSIR weights equal a brute-force hashed-bigram LLR model") {
    val corpus = docs()
    def bucket(bg: String): Char = {
      val md = MessageDigest.getInstance("MD5").digest(bg.getBytes("UTF-8"))
      f"${(md(0) & 0xff)}%02x".charAt(0)
    }
    val occ = corpus.flatMap { case (id, src, text) =>
      val tk = text.split(" ")
      (0 until tk.length - 1).map(i => (id, src, bucket(tk(i) + " " + tk(i + 1))))
    }
    val tTot = occ.count(_._2 == "src0").toDouble
    val rTot = occ.count(_._2 != "src0").toDouble
    val lr = occ.groupBy(_._3).map { case (b, os) =>
      val tc = os.count(_._2 == "src0"); val rc = os.size - tc
      b -> (math.log((tc + 1.0) / (tTot + 16.0)) - math.log((rc + 1.0) / (rTot + 16.0)))
    }
    val expected = occ.groupBy(_._1).map { case (id, os) =>
      id -> os.map(o => lr(o._3)).sum
    }
    val out = CurationOps.dsirWeights(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.keySet === expected.keySet)
    expected.foreach { case (id, w) =>
      assert(math.abs(out(id) - w) < 1e-6, s"doc $id: ${out(id)} vs $w")
    }
  }

  test("q141: growth curves are monotone and close at the corpus totals") {
    val rows = StatsOps.vocabGrowth(spark, sfDir).collect()
    assert(rows.length === 10)
    val cum = rows.map(_.getLong(2)); val voc = rows.map(_.getLong(3))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    assert(voc.zip(voc.tail).forall { case (a, b) => a <= b })
    val corpus = docs()
    val allBigrams = corpus.flatMap { case (_, _, text) =>
      val tk = text.split(" ")
      (0 until tk.length - 1).map(i => tk(i) + " " + tk(i + 1))
    }
    assert(cum.last === allBigrams.size.toLong)
    assert(voc.last === allBigrams.distinct.size.toLong)
  }

  test("q143: keep-first span deletion equals brute force") {
    val corpus = docs()
    val gramCount = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val firstPk = scala.collection.mutable.Map.empty[String, Long]
    val withGrams = corpus.map { case (id, _, text) =>
      val tk = text.split(" ")
      val grams = (0 to tk.length - 5).map(i => tk.slice(i, i + 5).mkString(" "))
      grams.zipWithIndex.foreach { case (g, i) =>
        gramCount(g) += 1
        val pk = id * 10000000L + (i + 1)
        if (!firstPk.contains(g) || pk < firstPk(g)) firstPk(g) = pk
      }
      (id, tk, grams)
    }
    val expected = withGrams.map { case (id, tk, grams) =>
      val covered = Array.fill(tk.length)(false)
      grams.zipWithIndex.foreach { case (g, i) =>
        val pk = id * 10000000L + (i + 1)
        if (gramCount(g) > 1 && pk != firstPk(g))
          (i until i + 5).foreach(covered(_) = true)
      }
      val kept = tk.indices.filterNot(covered).map(tk)
      id -> ((tk.length.toLong, kept.length.toLong, kept.mkString(" ").take(80)))
    }.toMap
    val out = TextOps.substringRewrite(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet === expected.keySet)
    expected.foreach { case (id, exp) => assert(out(id) === exp, s"doc $id") }
    // keep-first means at least one copy of every duplicated run survives:
    // strictly fewer tokens deleted than q139 marks as duplicated
    val q139 = TextOps.dupSpanCoverage(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    expected.foreach { case (id, (n, kept, _)) =>
      assert(n - kept <= q139(id), s"doc $id deleted more than its dup coverage")
    }
  }

  test("q144: operating-point counts tie out against the graded pair queries") {
    val r = TextOps.lshOperatingPoint(spark, sfDir).head
    val (nCand, nExact, nTp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTp <= math.min(nCand, nExact))
    // ground truth is exactly the graded q104 pair set
    val exact = TextOps.jaccardJoin(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(nExact === exact.size.toLong)
    // brute-force TP: LSH candidate pairs at rep grain that are true pairs
    assert(r.getDouble(3) === math.rint(nTp.toDouble / nCand * 1e6) / 1e6)
    assert(r.getDouble(4) === math.rint(nTp.toDouble / nExact * 1e6) / 1e6)
    // the configured operating point must stay a high-recall one — a
    // band-parameter regression shows up here before it ships
    assert(r.getDouble(4) >= 0.9, s"LSH recall ${r.getDouble(4)} dropped below 0.9")
  }

  test("q146: the 4x1 banding dominates q144's 2x2 on recall and candidates") {
    val r22 = TextOps.lshOperatingPoint(spark, sfDir).head
    val r41 = TextOps.lshOperatingPointAt(spark, sfDir,
      Seq(Seq(0), Seq(1), Seq(2), Seq(3))).head
    // same ground truth by construction
    assert(r41.getLong(1) === r22.getLong(1))
    // a 2-component band match implies both 1-component bands match,
    // so the 4x1 candidate set is a superset: more candidates, tp
    // no lower, recall no lower
    assert(r41.getLong(0) >= r22.getLong(0))
    assert(r41.getLong(2) >= r22.getLong(2))
    assert(r41.getDouble(4) >= r22.getDouble(4))
  }

  test("q147: KN probabilities equal brute force and mass telescopes to 1") {
    val corpus = docs()
    val bigrams = corpus.flatMap { case (_, _, text) =>
      val tk = text.split(" ")
      (0 until tk.length - 1).map(i => (tk(i), tk(i + 1)))
    }
    val c12 = bigrams.groupBy(identity).map { case (p, os) => p -> os.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val nl = c12.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val nr = c12.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val nt = c12.size.toDouble
    val d = 0.75
    def pkn(w1: String, w2: String): Double =
      math.max(c12((w1, w2)) - d, 0.0) / c1(w1) +
        ((d * nl(w1) / c1(w1)) * (nr(w2) / nt))
    // resolve columns by name: the USING joins reorder them
    val byName = StatsOps.knBigramLm(spark, sfDir).collect().map { r =>
      val i1 = r.fieldIndex("w1"); val i2 = r.fieldIndex("w2")
      ((r.getString(i1), r.getString(i2)),
        (r.getLong(r.fieldIndex("c12")), r.getDouble(r.fieldIndex("pkn"))))
    }.toMap
    assert(byName.keySet === c12.keySet)
    byName.foreach { case ((w1, w2), (c, p)) =>
      assert(c === c12((w1, w2)))
      assert(math.abs(p - pkn(w1, w2)) < 1e-6, s"($w1,$w2)")
    }
    // full-vocabulary mass: observed rows + the backoff term over
    // UNOBSERVED continuations must sum to 1 for every context
    val vocabR = nr.keySet
    c1.keys.foreach { w1 =>
      val observed = vocabR.filter(w2 => c12.contains((w1, w2)))
      val massObs = observed.toSeq.map(w2 => pkn(w1, w2)).sum
      val massUnobs = (vocabR -- observed).toSeq
        .map(w2 => (d * nl(w1) / c1(w1)) * (nr(w2) / nt)).sum
      assert(math.abs(massObs + massUnobs - 1.0) < 1e-9, s"context $w1")
    }
  }

  test("q155: in-domain perplexity equals brute force and separates the domain") {
    val rows = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // brute-force LM over src0 bigrams with the operator's smoothing
    def bigrams(t: String): Seq[(String, String)] = {
      val tk = t.split(" ", -1)
      if (tk.length < 2) Seq.empty else tk.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val train = rows.filter(_._2 == "src0").flatMap(r => bigrams(r._3))
    val bc = train.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = bc.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val nl = bc.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val nr = bc.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val nt = bc.size.toLong
    val nu = nr.size.toLong
    def p(w1: String, w2: String): Double = {
      val pcont = (nr.getOrElse(w2, 0L) + 1.0) / (nt + nu + 1.0)
      c1.get(w1) match {
        case Some(cw1) =>
          math.max(bc.getOrElse((w1, w2), 0L) - 0.75, 0.0) / cw1 +
            ((0.75 * nl(w1) / cw1) * pcont)
        case None => pcont
      }
    }
    val got = graft.ops.StatsOps.indomainPpl(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    rows.filter(r => r._3.split(" ", -1).length >= 2).foreach { case (id, src, t) =>
      val bs = bigrams(t)
      val sumLp = bs.map(b => BigDecimal(math.log(p(b._1, b._2)))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val ppl = BigDecimal(math.exp(-sumLp / bs.length))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id)._1 === src && got(id)._2 === bs.length.toLong)
      assert(math.abs(got(id)._3 - ppl) < 2e-4, s"doc $id: ${got(id)._3} vs $ppl")
    }
    // the CCNet property this operator exists for: the target domain
    // scores measurably lower perplexity than every other source
    val bySrc = got.values.groupBy(_._1).map { case (s, v) =>
      s -> v.map(_._3).sum / v.size
    }
    val others = bySrc.filter(_._1 != "src0").values
    assert(others.forall(_ > bySrc("src0") * 1.2),
      s"in-domain separation missing: $bySrc")
  }

  test("q149: leakage matrix ties out against the graded pair set and hash splits") {
    val pairs = TextOps.minhashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def split(id: Long): String = {
      val md = MessageDigest.getInstance("MD5").digest(s"split:$id".getBytes("UTF-8"))
      val c = f"${(md(0) & 0xff)}%02x".charAt(0)
      if (c < 'c') "train" else if (c < 'e') "val" else "test"
    }
    val expected = pairs.map { case (a, b) =>
      val (sa, sb) = (split(a), split(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val out = TextOps.splitLeakage(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet === expected.keySet)
    expected.foreach { case (k, n) => assert(out(k)._1 === n, s"pair class $k") }
    assert(out.values.map(_._1).sum === pairs.length.toLong)
    // shares sum to 1 over the full matrix
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-4)
  }

  test("q154: soft-dedup weights are 1/cluster_size from an independent union-find over the pair set") {
    // independent clustering: union-find over the graded candidate
    // pairs (not the operator's star fixpoint)
    val pairs = TextOps.minhashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val clusterOf = docs.map { case (id, _) => id -> find(id) }.toMap
    val sizes = clusterOf.values.groupBy(identity).map { case (c, v) => c -> v.size }
    val out = TextOps.softDedupWeights(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out.keySet === docs.map(_._1).toSet) // every doc weighted
    docs.foreach { case (id, nt) =>
      val (cl, cs, nTok, w, eff) = out(id)
      assert(cl === clusterOf(id), s"cluster of $id")
      assert(cs === sizes(clusterOf(id)).toLong, s"size of $id's cluster")
      assert(nTok === nt)
      assert(w === BigDecimal(1.0 / cs).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(eff === BigDecimal(nt.toDouble / cs).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the soft-dedup invariant: expected appearances per cluster = 1
    val perCluster = out.values.groupBy(_._1).map { case (_, v) => v.map(_._4).sum }
    perCluster.foreach(s => assert(math.abs(s - 1.0) < 1e-4))
    // and duplicates genuinely exist on this corpus (the weights bite)
    assert(out.values.exists(_._4 < 1.0))
  }

  test("q151: cluster-grain splits have zero cross-split leakage, sane proportions") {
    val rows = TextOps.clusterSplit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // diagonal only: every candidate pair stays inside one split
    rows.foreach { r =>
      assert(r.getString(0) === r.getString(1),
        s"cross-split pairs under cluster splits: ${r.getString(0)}/${r.getString(1)}")
    }
    // the matrix still accounts for every candidate pair
    val nPairs = TextOps.minhashPairs(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum === nPairs)
    // doc counts cover the corpus across the (≤3) split classes present
    val splitsSeen = TextOps.clusterSplit(spark, sfDir)
      .select("split_a", "n_docs_a").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.documents(spark, sfDir).count()
    assert(splitsSeen.values.sum <= total)
    assert(splitsSeen.getOrElse("train", 0L) > splitsSeen.getOrElse("val", 0L))
  }

  test("q150: run statistics equal brute force") {
    val expected = docs().flatMap { case (id, _, text) =>
      val tk = text.split(" ")
      if (tk.length < 2) None else {
        var adj = 0; var run = 1; var best = 1
        (1 until tk.length).foreach { i =>
          if (tk(i) == tk(i - 1)) { adj += 1; run += 1; best = math.max(best, run) }
          else run = 1
        }
        Some(id -> ((tk.length.toLong, best.toLong,
          math.rint(adj.toDouble / (tk.length - 1) * 1e6) / 1e6, best >= 4)))
      }
    }.toMap
    val out = CurationOps.degenerateRuns(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out.keySet === expected.keySet)
    expected.foreach { case (id, e) => assert(out(id) === e, s"doc $id") }
  }

  test("q145: selection is exactly the per-source top-5 of the weight table") {
    val weights = CurationOps.dsirWeights(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    val expected = weights.groupBy(_._2).toSeq.flatMap { case (src, ws) =>
      ws.sortBy(w => (-w._3, w._1)).take(5).zipWithIndex
        .map { case ((id, _, w), i) => (id, src, w, (i + 1).toLong) }
    }.toSet
    val out = CurationOps.dsirSelect(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    assert(out === expected)
  }

  test("q142: OLS fit equals brute force over the ranked counts") {
    val corpus = docs()
    val counts = corpus.flatMap { case (_, _, text) =>
      val tk = text.split(" ")
      (0 until tk.length - 1).map(i => tk(i) + " " + tk(i + 1))
    }.groupBy(identity).map { case (t, os) => (t, os.size.toLong) }
    val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(100)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (math.log(i + 1.0), math.log(c.toDouble))
    }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum; val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    val r = StatsOps.zipfFit(spark, sfDir).head
    assert(r.getLong(0) === top.size.toLong)
    assert(math.abs(r.getDouble(1) - slope) < 1e-6)
    assert(math.abs(r.getDouble(2) - intercept) < 1e-6)
    // corpus sanity: frequency decays with rank
    assert(r.getDouble(1) < 0.0)
  }

  test("q158 retention report equals a brute-force shingle decontamination") {
    val rows = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(t: String): Set[String] = {
      val tk = t.split(" ", -1)
      if (tk.length < 3) Set.empty else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val probe = rows.filter(_._1 % 31 == 0).flatMap(r => shingles(r._3)).toSet
    val train = rows.filter(_._1 % 31 != 0)
    val flagged = train.filter(r => (shingles(r._3) & probe).size >= 3).map(_._1).toSet
    val expected = train.groupBy(_._2).map { case (src, docs) =>
      val kept = docs.filter(d => !flagged(d._1))
      val nt = docs.map(_._3.split(" ", -1).length.toLong).sum
      val ntKept = kept.map(_._3.split(" ", -1).length.toLong).sum
      src -> ((docs.size.toLong, (docs.size - kept.size).toLong, nt, ntKept))
    }
    val got = graft.ops.TextOps.deconRetention(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (src, (n, nf, nt, ntk)) =>
      val (gn, gnf, gnt, gntk, ret) = got(src)
      assert((gn, gnf, gnt, gntk) === ((n, nf, nt, ntk)), s"source $src")
      assert(ret === BigDecimal((n - nf).toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the gate bites on this corpus (mirrored eval shingles exist)
    assert(flagged.nonEmpty)
  }

  test("q160 coverage curve equals brute force and is monotone in k") {
    val grams = docs().flatMap { case (_, _, t) =>
      val tk = t.split(" ", -1)
      if (tk.length < 3) Seq.empty
      else tk.sliding(3).map(_.mkString(" ")).toSeq
    }
    val counts = grams.groupBy(identity).map { case (g, v) => g -> v.size.toLong }
    val ranked = counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(10000)
    val total = counts.values.sum
    val got = graft.ops.StatsOps.vocabCoverage(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got.keySet === Set(100L, 500L, 1000L, 2000L, 5000L, 10000L))
    got.foreach { case (k, (nTypes, covered, tot, coverage)) =>
      assert(nTypes === counts.size.toLong)
      assert(tot === total)
      val cut = math.min(k.toInt, ranked.size)
      val expCov = ranked.take(cut).map(_._2).sum
      assert(covered === expCov, s"k=$k")
      assert(coverage === BigDecimal(expCov.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // coverage is monotone non-decreasing in k
    val byK = got.toSeq.sortBy(_._1).map(_._2._4)
    assert(byK.zip(byK.tail).forall { case (a, b) => a <= b })
  }

  test("q161 interaction rollup ties out against the graded quality and weight frames") {
    val qual = TextOps.qualityEnsemble(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    val csize = TextOps.softDedupWeights(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expected = qual.toSeq.map { case (id, q) =>
      (math.min(math.floor(q * 4), 3.0).toLong, csize(id))
    }.groupBy(_._1).map { case (qt, v) =>
      qt -> ((v.size.toLong, v.count(_._2 > 1).toLong, v.map(_._2).sum))
    }
    val got = TextOps.qualityDupInteraction(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (qt, (n, nd, sz)) =>
      val (gn, gnd, rate, mean) = got(qt)
      assert((gn, gnd) === ((n, nd)), s"quartile $qt")
      assert(rate === BigDecimal(nd.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(mean === BigDecimal(sz.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.values.map(_._1).sum === qual.size.toLong)
  }

  test("q162 KS drift equals a brute-force two-sample statistic per source") {
    val rows = docs().map { case (_, src, t) => (src, t.split(" ", -1).length) }
    val all = rows.map(_._2).sorted
    val nAll = all.size.toLong
    def cdfNum(xs: Seq[Int], l: Int): Long = xs.count(_ <= l).toLong
    val got = graft.ops.StatsOps.lengthDriftKs(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    rows.groupBy(_._1).foreach { case (src, v) =>
      val xs = v.map(_._2)
      val n = xs.size.toLong
      val lens = all.distinct
      val ksNum = lens.map(l =>
        math.abs(cdfNum(xs, l) * nAll - cdfNum(all, l) * n)).max
      val (gn, gnum, gks) = got(src)
      assert(gn === n, s"source $src")
      assert(gnum === ksNum, s"source $src ks_num")
      assert(gks === BigDecimal(ksNum.toDouble / (n * nAll))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // KS is a proper statistic: within [0, 1]
    got.values.foreach { case (_, _, ks) => assert(ks >= 0.0 && ks <= 1.0) }
  }

  test("q163 histogram equals brute-force exact Jaccard over the graded pair set") {
    val pairs = TextOps.minhashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val shingleSets = docs().map { case (id, _, t) =>
      val tk = t.split(" ", -1)
      id -> (if (tk.length < 3) Set.empty[String]
             else tk.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap
    val expected = pairs.map { case (a, b) =>
      val (sa, sb) = (shingleSets(a), shingleSets(b))
      val inter = (sa & sb).size.toLong
      val uni = sa.size + sb.size - inter
      math.min(10 * inter / uni, 9L)
    }.groupBy(identity).map { case (b, v) => b -> v.size.toLong }
    val got = TextOps.neardupSimHistogram(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (b, n) =>
      assert(got(b)._1 === n, s"bin $b")
      assert(got(b)._2 === BigDecimal(n.toDouble / pairs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.values.map(_._1).sum === pairs.length.toLong)
  }

  test("q164 fertility ties out: applied merges reproduce the trainer's final corpus totals") {
    // the composed 30-merge column must shrink the corpus by exactly
    // the trainer's own final-docs token count, and per-source totals
    // must tie to raw doc stats
    val out = TextOps.bpeFertility(spark, sfDir).collect()
    val corpus = docs()
    val bySrc = corpus.groupBy(_._2)
    out.foreach { r =>
      val src = r.getString(0)
      val rows = bySrc(src)
      assert(r.getLong(1) === rows.size.toLong)
      assert(r.getLong(2) === rows.map(_._3.split(" ", -1).length.toLong).sum)
      assert(r.getLong(3) <= r.getLong(2), s"$src grew under merges")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
    // corpus-wide: after-totals equal the trainer's rewritten corpus
    val (_, finalDocs, _) = TextOps.bpeTrainLoop(spark, sfDir, 30, None)
    val trainerAfter = finalDocs.collect().map(_.getString(0).split(" ", -1).length.toLong).sum
    assert(out.map(_.getLong(3)).sum === trainerAfter)
  }

  test("q165 degree distribution ties out against the graded pair set") {
    val pairs = TextOps.minhashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).map { case (id, v) => id -> v.size }
    val nTotal = Tables.documents(spark, sfDir).count()
    val expected = deg.values
      .map(d => math.min(64 - java.lang.Long.numberOfLeadingZeros(d.toLong), 6))
      .groupBy(identity).map { case (b, v) => b.toLong -> v.size.toLong }
      .updated(0L, nTotal - deg.size)
    val got = TextOps.dedupDegreeDist(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === expected.filter(_._2 > 0).keySet ++ Set(0L))
    expected.filter(_._2 > 0).foreach { case (b, n) =>
      assert(got(b)._2 === n, s"bucket $b")
      assert(got(b)._1 === (if (b == 0) 0L else 1L << (b - 1)).toLong)
      assert(got(b)._3 === BigDecimal(n.toDouble / nTotal)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.values.map(_._2).sum === nTotal)
  }
}
