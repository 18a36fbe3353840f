package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BigramStats, GraftFunctions, MinhashHex, StopwordCounts}
import graft.functions.GraftFunctions.{bigramStats, minhashHex, rotateHex, stopwordCounts}

/** Grades the codegen'd scalar expressions that replaced interpreted
  * HOF hot paths: each must be value-identical to the HOF formulation
  * it displaced (that formulation IS the DuckDB-oracle semantics), and
  * the interpreted eval must agree with the codegen path the DataFrame
  * queries take. */
class NativeExpressionsSpec extends AnyFunSuite with LocalSparkSuite {

  private def docsWithToks = Tables.documents(spark, sfDir)
    .select(col("doc_id"), split(col("text"), " ").as("tk"))

  test("MinhashHex matches the HOF md5-rotate-min formulation on the corpus") {
    val viaHof = docsWithToks
      .filter(size(col("tk")) >= 3)
      .withColumn("sh", expr("transform(sequence(1, size(tk)-2), i -> concat(" +
        "element_at(tk, i), ' ', element_at(tk, i+1), ' ', element_at(tk, i+2)))"))
      .select(col("doc_id"), transform(col("sh"), h => md5(h)).as("hs"))
      .select(col("doc_id"),
        array_min(transform(col("hs"), h => rotateHex(h, 0))).as("mh0"),
        array_min(transform(col("hs"), h => rotateHex(h, 3))).as("mh3"))
    val viaNative = docsWithToks
      .filter(size(col("tk")) >= 3)
      .withColumn("sh", expr("transform(sequence(1, size(tk)-2), i -> concat(" +
        "element_at(tk, i), ' ', element_at(tk, i+1), ' ', element_at(tk, i+2)))"))
      .select(col("doc_id"), minhashHex(col("sh"), 4).as("ms"))
      .select(col("doc_id"), col("ms")(0).as("mh0"), col("ms")(3).as("mh3"))
    val diff = viaHof.join(viaNative, Seq("doc_id"))
      .filter(viaHof("mh0") =!= viaNative("mh0") || viaHof("mh3") =!= viaNative("mh3"))
    assert(diff.count() === 0)
  }

  test("MinhashHex eval (interpreted) agrees with the DataFrame (codegen) path") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val shingles = Seq("a b c", "b c d", "c d e")
    val viaEval = MinhashHex.compute(
      new GenericArrayData(shingles.map(UTF8String.fromString).toArray[Any]), 4)
    val viaDf = spark.range(1)
      .select(minhashHex(typedLit(shingles), 4).as("ms"))
      .head().getSeq[String](0)
    assert(viaEval.array.map(_.toString).toSeq === viaDf)
  }

  test("MinhashHex yields NULL for an empty shingle array (as array_min did)") {
    val r = spark.range(1)
      .select(minhashHex(typedLit(Seq.empty[String]), 4).as("ms")).head()
    assert(r.isNullAt(0))
  }

  test("BigramStats matches the sorted-run-max formulation on the corpus") {
    val viaHof = docsWithToks.filter(size(col("tk")) >= 2)
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n"),
        size(array_distinct(col("tk"))).cast("long").as("nd"),
        sort_array(expr("transform(sequence(1, size(tk)-1), " +
          "i -> concat(element_at(tk,i), ' ', element_at(tk,i+1)))")).as("sb"))
      .select(col("doc_id"), col("n"), col("nd"),
        expr("aggregate(sb, struct(cast('' as string) as prev, 0L as run, 0L as best), " +
          "(a, x) -> struct(x as prev, if(x = a.prev, a.run + 1, 1L) as run, " +
          "greatest(a.best, if(x = a.prev, a.run + 1, 1L)) as best), a -> a.best)").as("top"))
    val viaNative = docsWithToks.filter(size(col("tk")) >= 2)
      .select(col("doc_id"), bigramStats(col("tk")).as("bs"))
      .select(col("doc_id"), col("bs")(0).as("n"), col("bs")(1).as("nd"),
        col("bs")(2).as("top"))
    val joined = viaHof.alias("h").join(viaNative.alias("v"), Seq("doc_id"))
    assert(joined.filter(col("h.n") =!= col("v.n") || col("h.nd") =!= col("v.nd")
      || col("h.top") =!= col("v.top")).count() === 0)
  }

  test("BigramStats on degenerate repetition counts the dominant bigram") {
    // "x x x x" → 3 bigrams, all "x x": top = 3; 1 distinct of 4 tokens
    val r = spark.range(1)
      .select(bigramStats(typedLit(Seq("x", "x", "x", "x"))).as("bs"))
      .head().getSeq[Long](0)
    assert(r === Seq(4L, 1L, 3L))
  }

  test("StopwordCounts matches per-profile filter() scans and double-counts shared words") {
    val profiles = Seq(Seq("the", "de", "of"), Seq("de", "la"))
    val viaHof = docsWithToks.select(col("doc_id"),
      expr("size(filter(tk, t -> t IN ('the','de','of')))").as("s0"),
      expr("size(filter(tk, t -> t IN ('de','la')))").as("s1"))
    val viaNative = docsWithToks
      .select(col("doc_id"), stopwordCounts(col("tk"), profiles).as("sc"))
      .select(col("doc_id"), col("sc")(0).as("s0"), col("sc")(1).as("s1"))
    val joined = viaHof.alias("h").join(viaNative.alias("v"), Seq("doc_id"))
    assert(joined.filter(col("h.s0") =!= col("v.s0")
      || col("h.s1") =!= col("v.s1")).count() === 0)
    // a token in BOTH profiles increments both counters
    val both = spark.range(1)
      .select(stopwordCounts(typedLit(Seq("de", "x", "de")), profiles).as("sc"))
      .head().getSeq[Int](0)
    assert(both === Seq(2, 2))
  }

  test("BigramBuckets matches the HOF md5-substring formulation on the corpus") {
    val viaHof = docsWithToks
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), expr(
        "transform(sequence(1, size(tk) - 1), i -> " +
          "substring(md5(concat_ws(' ', element_at(tk, i), element_at(tk, i + 1))), 1, 1))")
        .as("bks"))
    val viaNative = docsWithToks
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"),
        GraftFunctions.bigramBuckets(col("tk")).as("bks"))
    val diff = viaHof.join(viaNative.withColumnRenamed("bks", "bks2"), Seq("doc_id"))
      .filter(col("bks") =!= col("bks2"))
    assert(diff.count() === 0)
    // a 1-token doc has no bigrams: empty array, not null
    val one = viaNative.sparkSession.createDataFrame(Seq(Tuple1(Seq("solo"))))
      .toDF("tk").select(GraftFunctions.bigramBuckets(col("tk")).as("b")).head
    assert(one.getSeq[String](0).isEmpty)
    // null elements follow concat_ws semantics (drop null + separator),
    // matching the declarative formulation on containsNull arrays
    val withNulls = spark.range(1).select(
      expr("array('a', CAST(NULL AS STRING), 'b', CAST(NULL AS STRING), CAST(NULL AS STRING))").as("tk"))
    val nb = withNulls.select(GraftFunctions.bigramBuckets(col("tk")).as("b"))
      .head.getSeq[String](0)
    val nh = withNulls.select(expr(
      "transform(sequence(1, size(tk) - 1), i -> " +
        "substring(md5(concat_ws(' ', element_at(tk, i), element_at(tk, i + 1))), 1, 1))").as("b"))
      .head.getSeq[String](0)
    assert(nb === nh)
  }

  test("SignPack matches the HOF zip_with/aggregate formulation on the corpus") {
    import graft.functions.GraftFunctions.signPack
    val emb = Tables.embeddings(spark, sfDir)
    def hofWord(from: Int): org.apache.spark.sql.Column =
      expr(s"aggregate(zip_with(slice(embedding, ${from + 1}, 32), sequence(0, 31), " +
        s"(v, i) -> IF(v > 0f, shiftleft(1L, i), 0L)), 0L, (a, x) -> a + x)")
    val diff = emb.select(
      signPack(col("embedding"), 0, 32).as("n0"), hofWord(0).as("h0"),
      signPack(col("embedding"), 32, 32).as("n1"), hofWord(32).as("h1"))
      .filter(col("n0") =!= col("h0") || col("n1") =!= col("h1"))
    assert(diff.count() === 0)
  }

  test("SignPack eval (interpreted) agrees with the DataFrame (codegen) path and clears out-of-range bits") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.SignPack
    val arr = Array[Any](1.0f, -2.0f, 0.0f, 3.5f) // bits 0 and 3 set
    val viaEval = SignPack(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        new GenericArrayData(arr),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      0, 32).eval(null)
    val viaDf = spark.range(1)
      .select(GraftFunctions.signPack(
        typedLit(Seq(1.0f, -2.0f, 0.0f, 3.5f)), 0, 32).as("w"))
      .head().getLong(0)
    assert(viaEval === 9L && viaDf === 9L)
    // elements past the array end read as sign-clear, never garbage
    val hi = spark.range(1)
      .select(GraftFunctions.signPack(typedLit(Seq(1.0f, 2.0f)), 32, 32).as("w"))
      .head().getLong(0)
    assert(hi === 0L)
    intercept[IllegalArgumentException] { SignPack(null, 0, 64) }
    intercept[IllegalArgumentException] { SignPack(null, -1, 32) }
  }

  test("SQL registration covers the full native-expression surface") {
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs_native")
    val r = spark.sql(
      """SELECT graft_minhash(graft_shingles(split(text, ' '), 3), 4)[0] AS mh0,
        |       graft_bigram_stats(split(text, ' '))[2] AS top_bigram,
        |       graft_stopword_counts(split(text, ' '), array('the','and'), array('de'))[1] AS s_de,
        |       graft_bpe_merge('x a b y', 'a b') AS merged
        |FROM docs_native WHERE size(split(text, ' ')) >= 3 AND doc_id = 0""".stripMargin)
      .head()
    assert(r.getString(0).length === 32)
    assert(r.getLong(1) >= 0L && r.getInt(2) >= 0)
    assert(r.getString(3) === "x a_b y")
    intercept[Exception] { // non-literal shingle width must be rejected
      spark.sql("SELECT graft_shingles(split(text,' '), doc_id) FROM docs_native").head()
    }
  }

  test("native expressions sit inside WholeStageCodegen (no CodegenFallback)") {
    val plan = docsWithToks
      .select(bigramStats(col("tk"))(0).as("a"),
        stopwordCounts(col("tk"), Seq(Seq("the")))(0).as("b"))
      .queryExecution.executedPlan.toString
    // "*(n)" marks a whole-stage-codegen'd operator in plan strings;
    // the projection holding both expressions must carry it
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_bigram_stats") && l.trim.startsWith("*(")))
    // the displaced HOF forms were CodegenFallback; these must not be
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[BigramStats]))
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[StopwordCounts]))
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[MinhashHex]))
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.functions.BpeMergePair]))
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.functions.BigramBuckets]))
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.functions.SignPack]))
  }

  test("q103's plan keeps the bloom prefilter ahead of the exact join") {
    val df = graft.ops.TextOps.bloomContamination(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the sketch probe must survive optimization (otherwise q103 has
    // silently degenerated into q69's broadcast-only plan)
    assert(plan.contains("might_contain"), "bloom prefilter missing from plan")
    // at test scale the probe estimate sits under the session's
    // autoBroadcastJoinThreshold, so the adaptive exact phase must
    // have picked the broadcast regime
    assert(plan.contains("BroadcastHashJoin"),
      "small probe should broadcast in the exact phase")
    // and the two-phase answer must still be the exact one
    val exact = graft.ops.TextOps.contamination(spark, sfDir)
    assert(df.collect().toSeq === exact.collect().toSeq)
  }

  test("q103's exact phase flips to shuffle when the probe outgrows the threshold") {
    // force the over-threshold regime: zero broadcast budget
    val df = graft.ops.TextOps.bloomContaminationAt(spark, sfDir, Some(0L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom prefilter missing from plan")
    assert(plan.contains("ShuffledHashJoin"),
      "over-threshold probe must ride the pinned shuffle-hash join")
    assert(!plan.contains("BroadcastHashJoin"),
      "over-threshold probe must not broadcast")
    // identical answer in either regime — bloom prunes, the join proves
    val exact = graft.ops.TextOps.contamination(spark, sfDir)
    assert(df.collect().toSeq === exact.collect().toSeq)
  }
}
