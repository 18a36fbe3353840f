package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{TextOps, VectorOps}

/** Structural invariants of the round-8 curation-analytics layer
  * (B48–B51) — properties the DuckDB hash-match can't state directly
  * because they relate a query's output to ANOTHER view of the same
  * corpus. */
class CurationAnalyticsSpec extends AnyFunSuite with LocalSparkSuite {

  test("q106: every shingle is novel in exactly its first doc (sums tie out)") {
    val out = TextOps.shingleNovelty(spark, sfDir).cache()
    try {
      // Σ n_novel over docs = global distinct-shingle count: each
      // distinct shingle contributes novelty to exactly one doc
      val sumNovel = out.agg(sum(col("n_novel"))).head.getLong(0)
      val globalDistinct = Tables.documents(spark, sfDir)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .select(explode(graft.functions.GraftFunctions
          .shingles(col("toks"), 3)).as("s"))
        .distinct().count()
      assert(sumNovel === globalDistinct)
      // the earliest doc carrying shingles sees everything first
      val first = out.orderBy(col("doc_id")).head
      assert(first.getDouble(3) === 1.0)
      // novelty is a fraction of the doc's own shingles
      assert(out.filter(col("novelty") < 0 || col("novelty") > 1).count() === 0)
      assert(out.filter(col("n_novel") > col("n_shingles")).count() === 0)
    } finally out.unpersist()
  }

  test("q115: oriented wedge join counts exactly the brute-force triangles") {
    val edges = TextOps.dupEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the (tiny at this SF) edge set: every a<b<c
    // with all three edges present, counted at each corner
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val perNode = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      Seq(a, b, c) <- nodes.combinations(3)
      if edges((a, b)) && edges((b, c)) && edges((a, c))
      n <- Seq(a, b, c)
    } perNode(n) += 1
    val out = TextOps.dupTriangles(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet === perNode.keySet)
    perNode.foreach { case (n, t) =>
      assert(out(n)._1 === t, s"node $n: ${out(n)._1} != brute-force $t")
      // a corner closes at most C(deg, 2) triangles
      val d = out(n)._2
      assert(t <= d * (d - 1) / 2, s"node $n: $t triangles > C($d,2)")
    }
  }

  test("q148: MMR unroll equals a brute-force greedy and diversifies vs plain top-k") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    // sequential fold in document order — the dotFast/list_sum order
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val q = vecs(0L)
    val cand = vecs.filter { case (id, _) => id != 0L && id < 200L }
    val rel = cand.map { case (id, v) => id -> cos(v, q) }
    var selected = Vector.empty[Long]
    val expected = (1 to 5).map { r =>
      val scored = cand.keys.filterNot(selected.contains).map { id =>
        val pen = if (selected.isEmpty) 0.0
          else selected.map(s => cos(cand(id), cand(s))).max
        val score = if (r == 1) 0.7 * rel(id) else 0.7 * rel(id) - 0.3 * pen
        (id, math.rint(score * 1e6) / 1e6)
      }.toSeq
      val (id, sc) = scored.minBy { case (id, sc) => (-sc, id) }
      selected :+= id
      (r.toLong, id, sc)
    }
    val out = VectorOps.mmrDiverse(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === expected)
    // the selection must actually diversify: its round-2+ picks are not
    // simply relevance ranks 2..5 (otherwise the penalty did nothing)
    val plainTop = rel.toSeq.sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(out.map(_._2).toSeq !== plainTop,
      "MMR returned exactly the plain top-5 — penalty had no effect")
  }

  test("q118: mined negatives are true cross-label pairs in rank order") {
    val out = VectorOps.hardNegatives(spark, sfDir).cache()
    try {
      val labels = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val rows = out.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        // a negative must differ from the anchor's ground-truth label,
        // and the reported nbr_label must be the neighbor's real one
        assert(labels(r.getLong(2)) === r.getInt(3))
        assert(labels(r.getLong(0)) !== r.getInt(3),
          s"vec ${r.getLong(0)}: negative shares its label")
      }
      // per anchor: ranks are 1..k and cosine is non-increasing in rank
      rows.groupBy(_.getLong(0)).foreach { case (v, rs) =>
        val sorted = rs.sortBy(_.getLong(1))
        assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length))
        assert(sorted.sliding(2).forall {
          case Array(a, b) => a.getDouble(4) >= b.getDouble(4)
          case _ => true
        }, s"vec $v: cosine not monotone in rank")
      }
    } finally out.unpersist()
  }

  test("q107: decile rollup partitions the train docs exactly") {
    val out = TextOps.contaminationRatio(spark, sfDir).cache()
    try {
      val trainDocs = Tables.documents(spark, sfDir)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .filter(col("doc_id") % 31 =!= 0)
        .select(col("doc_id")).distinct().count()
      assert(out.agg(sum(col("n_docs"))).head.getLong(0) === trainDocs)
      assert(out.filter(col("decile") < 0 || col("decile") > 9).count() === 0)
      assert(out.filter(col("tot_shared") > col("tot_shingles")).count() === 0)
    } finally out.unpersist()
  }

  test("q108: one row per unordered lang pair, Jaccard consistent with set sizes") {
    val out = TextOps.langVocabOverlap(spark, sfDir).cache()
    try {
      val langs = Tables.documents(spark, sfDir)
        .select(col("lang")).distinct().count().toInt
      assert(out.count() === langs.toLong * (langs - 1) / 2)
      assert(out.filter(col("jaccard") <= 0 || col("jaccard") > 1).count() === 0)
      // spot-check one pair against a direct two-set computation
      val r = out.orderBy(col("lang_a"), col("lang_b")).head
      def vocab(l: String) = Tables.documents(spark, sfDir)
        .filter(col("lang") === l)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .distinct().collect().map(_.getString(0)).toSet
      val a = vocab(r.getString(1))
      val b = vocab(r.getString(0))
      val inter = a.intersect(b).size
      assert(r.getLong(2) === inter.toLong)
      assert(r.getDouble(3) === inter.toDouble / (a.size + b.size - inter))
    } finally out.unpersist()
  }

  test("q109: recall is hits/10, hits bounded by candidates and by k") {
    val out = VectorOps.annRecall(spark, sfDir).cache()
    try {
      val nQueries = Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") % 100 === 0).count()
      assert(out.count() === nQueries)
      assert(out.filter(col("hits") > 10).count() === 0)
      assert(out.filter(col("hits") > col("n_cand")).count() === 0)
      assert(out.filter(col("recall10") =!=
        col("hits").cast("double") / 10).count() === 0)
    } finally out.unpersist()
  }

  test("q112: neighbors obey block semantics, ranks contiguous from 1") {
    val out = VectorOps.annKnnJoin(spark, sfDir).cache()
    try {
      assert(out.filter(col("vec_id") === col("nbr_id")).count() === 0)
      assert(out.filter(col("rk") < 1 || col("rk") > 3).count() === 0)
      // per vector: ranks are 1..k with no holes
      val bad = out.groupBy(col("vec_id"))
        .agg(count(lit(1)).as("k"), max(col("rk")).as("mx"))
        .filter(col("k") =!= col("mx")).count()
      assert(bad === 0)
    } finally out.unpersist()
  }

  test("q113: shared chunks bounded by each source's own distinct chunk count") {
    val out = TextOps.sourceDupMatrix(spark, sfDir).cache()
    try {
      val perSource = Tables.documents(spark, sfDir)
        .select(col("source"), split(col("text"), " ").as("t"))
        .select(col("source"), explode(expr(
          "transform(sequence(0, CAST(ceil(size(t)/32.0) AS INT) - 1), " +
            "i -> md5(array_join(slice(t, i*32+1, 32), ' ')))")).as("h"))
        .distinct().groupBy(col("source")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      out.collect().foreach { r =>
        val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
        assert(a < b)
        assert(n >= 1 && n <= math.min(perSource(a), perSource(b)))
      }
    } finally out.unpersist()
  }

  test("q114: profile metrics consistent with the table they profile") {
    val out = graft.ops.StatsOps.columnProfile(spark, sfDir).cache()
    try {
      val n = Tables.lineitem(spark, sfDir).count()
      out.collect().foreach { r =>
        assert(r.getLong(1) >= 0 && r.getLong(1) <= n)        // n_nulls
        assert(r.getLong(2) >= 1 && r.getLong(2) <= n)        // n_distinct
        assert(r.getString(3) <= r.getString(4) ||            // min<=max unless
          r.getString(0) == "l_quantity" ||                   // numeric-as-string
          r.getString(0) == "l_orderkey" ||
          r.getString(0) == "l_linenumber")
      }
    } finally out.unpersist()
  }

  test("q157 waterfill satisfies the KKT optimality conditions against independent stats") {
    import org.apache.spark.sql.functions._
    // independent per-source stats from the raw table
    val stats = Tables.documents(spark, sfDir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("nt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (s, v) => s -> ((v.size.toLong, v.map(_._2).sum)) }
    val b = stats.values.map(_._2).sum / 2
    val out = graft.ops.CurationOps.tokenWaterfill(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getLong(5)))).toMap
    assert(out.keySet === stats.keySet)
    // stats columns tie out; weights are q117's integer temperature
    stats.foreach { case (src, (n, sup)) =>
      val (gn, gs, gw, _, alloc) = out(src)
      assert(gn === n && gs === sup)
      assert(gw === math.floor(math.sqrt((n * 1000000L).toDouble)).toLong)
      assert(alloc <= sup, s"$src allocated beyond supply")
    }
    // budget exhausted up to the <1-per-source floor remainder
    val total = out.values.map(_._5).sum
    assert(total <= b && total > b - out.size, s"sum $total vs budget $b")
    // KKT: a single water level lambda = L/W rationalizes every row —
    // saturated rows sit below it, unsaturated rows are its floor cut
    val l = b - out.values.collect { case (_, s, _, true, _) => s }.sum
    val wSum = out.values.collect { case (_, _, w, false, _) => w }.sum
    out.foreach { case (src, (_, sup, w, saturated, alloc)) =>
      if (saturated) {
        assert(alloc === sup, s"$src saturated but not at supply")
        assert(sup * wSum <= l * w, s"$src saturated above the water level")
      } else {
        assert(alloc === (l * w) / wSum, s"$src alloc is not the lambda cut")
        assert(sup * wSum > l * w, s"$src unsaturated below the water level")
      }
    }
  }

  test("q181 CDC: boundaries re-align after a prefix edit; fixed stride can't") {
    import spark.implicits._
    // 64 deterministic tokens, then the same text with ONE token
    // inserted at the front — the edit a fixed-stride chunker smears
    // over every downstream chunk
    val words = (0 until 64).map(i => s"w${(i * 37) % 23}x${i % 7}")
    val base = words.mkString(" ")
    val edited = "zq9 " + base
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val ch = TextOps.cdcChunkTable(docs)
      .select("doc_id", "chunk_hash").collect()
    val h1 = ch.filter(_.getLong(0) == 1L).map(_.getString(1)).toSeq
    val h2 = ch.filter(_.getLong(0) == 2L).map(_.getString(1)).toSeq
    // content-defined: every chunk after the first boundary downstream
    // of the edit is bit-identical — the suffix of h1 reappears in h2
    val shared = h1.toSet.intersect(h2.toSet)
    assert(shared.nonEmpty, "CDC must preserve chunks past the edit")
    // and the tail of both chunkings is literally the same sequence
    val tailLen = (1 to math.min(h1.size, h2.size))
      .takeWhile(k => h1.takeRight(k) == h2.takeRight(k)).lastOption.getOrElse(0)
    assert(tailLen >= 1, "chunk tails must re-align after the edit")
    // the same edit under q86's fixed 32-token stride shifts EVERY
    // chunk: no chunk of the edited doc equals any chunk of the base
    def strideChunks(t: String): Seq[String] =
      t.split(" ").grouped(32).map(_.mkString(" ")).toSeq
    assert(strideChunks(base).toSet.intersect(strideChunks(edited).toSet).isEmpty,
      "fixture must be one where fixed-stride loses all chunks")
    // dedup rollup sees the shared chunks as corpus-wide duplicates
    val dup = TextOps.cdcChunksFrom(docs).collect()
    assert(dup.nonEmpty && dup.forall(_.getLong(3) == 2L),
      "every duplicated chunk here spans both docs")
  }
}

