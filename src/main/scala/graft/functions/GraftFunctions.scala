package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic helper columns.
  *
  * The t2 gate hash-compares Spark output against DuckDB output, so any
  * value that depends on partition/accumulation order (double sums) or
  * on engine-specific types (DuckDB SUM(BIGINT)→HUGEINT) must be
  * canonicalized. The pattern used throughout:
  *
  *  - money/measure sums: cast each value to an exact DECIMAL first,
  *    sum (exact, associative → order-insensitive), cast the total back
  *    to DOUBLE, then ROUND. Bit-identical on both engines regardless
  *    of partitioning — which is exactly what survives a 1000-executor
  *    shuffle at 100 TB.
  *  - averages: exact decimal sum / count, divided in DOUBLE (both
  *    engines do the same single IEEE-754 division).
  *  - vector math: cast float arrays to double and fold sequentially;
  *    both engines do identical left-to-right IEEE adds.
  */
object GraftFunctions {

  /** The canonical money/measure decimal: scale 8 comfortably exceeds
    * the true decimal scale of every testdata column (≤4) and of
    * price*(1-disc)*(1+tax) products (≤8 on-grid), so the per-value
    * double→decimal cast is exact on both engines; precision 28 holds
    * ~1e19 — room for 100 TB-scale sums. NOTE: never rescale
    * decimal→decimal in oracle SQL (DuckDB truncates, Spark half-ups)
    * and never ROUND a clean-decimal double (the engines' tie rules
    * differ); the exact-sum-cast-to-double below needs neither. */
  val MoneyDec: DecimalType = DecimalType(28, 8)

  /** Order-insensitive sum of a double column via exact decimals;
    * bit-identical across engines and partitionings, unrounded. */
  def dsum(c: Column): Column = sum(c.cast(MoneyDec)).cast("double")

  /** Deterministic average: exact decimal sum / non-null count, divided
    * in double (one IEEE division — identical on both engines). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL fragment twins for the above (DuckDB side). The VARCHAR hop
    * matters: DuckDB's direct DECIMAL→DOUBLE cast double-rounds through
    * int128 and is off by one ulp once the scaled integer exceeds 2^53
    * (seen at sf0.1 sums ~6e9 → 6e17 scaled), while decimal→string is
    * exact and string→double is correctly rounded — matching Spark's
    * BigDecimal.doubleValue bit-for-bit at any magnitude. */
  def dsumSql(x: String): String =
    s"CAST(CAST(SUM(CAST($x AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE)"
  def davgSql(x: String): String = s"${dsumSql(x)}/COUNT($x)"

  /** Dot product of two float/double array columns in double precision,
    * folded left-to-right (matches DuckDB list_sum over a comprehension). */
  def dotd(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** Cosine similarity in double precision (HOF form). */
  def cosineSim(a: Column, b: Column): Column =
    dotd(a, b) / (sqrt(dotd(a, a)) * sqrt(dotd(b, b)))

  /** Codegen'd dot product (same values as dotd; see DotProduct).
    * Column↔Expression bridging goes through the classic-API utils
    * (Spark 4 decoupled Column from catalyst Expressions). */
  def dotFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftShims.{column, expression}
    column(DotProduct(expression(a), expression(b)))
  }

  /** 64-bit perceptual difference hash of a binary payload (see
    * [[DHash64]]): pixel tier for decodable images, byte-strip tier
    * otherwise. One codegen'd pass per row; only the 8-byte hash ever
    * reaches a shuffle. */
  def dhash64(payload: Column): Column = {
    import org.apache.spark.sql.GraftShims.{column, expression}
    column(DHash64(expression(payload)))
  }

  /** The BPE winner-bigram token merge via the native expression —
    * value-identical to the shared aggregate()/list_reduce() fold
    * (WinnowingSpec pins the equality), one codegen'd linear byte
    * scan per document instead of an interpreted per-token fold. */
  def bpeMergeFast(text: Column, pair: Column): Column = {
    import org.apache.spark.sql.GraftShims.{column, expression}
    column(BpeMergePair(expression(text), expression(pair)))
  }

  /** Cosine similarity on float arrays via the native expression —
    * value-identical to cosineSim, ~10× faster per row. */
  def cosineSimFast(a: Column, b: Column): Column =
    dotFast(a, b) / (sqrt(dotFast(a, a)) * sqrt(dotFast(b, b)))

  /** Binary-quantization sign word (see [[SignPack]]): bit i set iff
    * element (offset+i) of the array is > 0. len <= 63 — pack wide
    * vectors as multiple words (q192 packs 64 dims as two 32-bit
    * halves, the oracle-portable layout). */
  def signPack(v: Column, offset: Int, len: Int): Column = {
    import org.apache.spark.sql.GraftShims.{column, expression}
    column(SignPack(expression(v), offset, len))
  }

  /** MinHash family over hex digests: permutation i = rotate an md5 hex
    * string left by 2*i chars; MIN over a set approximates a random
    * permutation min. One md5 per element total (compute `md5(s)` once
    * into a column, rotate that), and string MIN is engine-portable —
    * no 64-bit hash dialect issues. Seed of the idea: MediaWiki's own
    * sha1-based revision dedup (SURVEY.md §0.2) generalized to
    * Broder-style minhash sketching. */
  def rotateHex(h: Column, i: Int): Column =
    if (i == 0) h
    else concat(substring(h, 2 * i + 1, 32 - 2 * i), substring(h, 1, 2 * i))

  /** HLL distinct-count sketch column (see [[HllSketchAgg]]): the
    * TypedImperativeAggregate twin of `approx_count_distinct`, with a
    * partitioning-independent (deterministic) estimate. */
  def hllDistinct(c: Column, precision: Int = 12): Column = {
    import org.apache.spark.sql.GraftShims.{column, expression}
    column(HllSketchAgg(expression(c), precision).toAggregateExpression())
  }

  /** Misra–Gries heavy-hitter candidate array (see [[MisraGriesAgg]]):
    * ≤ k keys, guaranteed to contain every value with frequency
    * > n/(k+1). Pair with an exact re-count of the candidates for a
    * partitioning-independent two-pass heavy-hitter query (q93). */
  def heavyHitterCandidates(c: Column, k: Int = 127): Column = {
    import org.apache.spark.sql.GraftShims.{column, expression}
    // explicit cast → keys are the column's EXTERNAL string form
    // ('1996-01-01', not epoch-day 9570); no-op for string columns
    column(MisraGriesAgg(expression(c.cast("string")), k).toAggregateExpression())
  }

  /** Log-histogram quantile estimates (see [[LogHistogramAgg]]): one
    * array<bigint> of rank-q bucket midpoints, relative error
    * ≤ 2^-(m+1), partitioning-independent, and integer-exactly
    * replayable in SQL (the q110 oracle). */
  def logPercentiles(c: Column, qs: Seq[Double], m: Int = 7): Column = {
    import org.apache.spark.sql.GraftShims.{column, expression}
    column(LogHistogramAgg(expression(c.cast("long")), qs, m).toAggregateExpression())
  }

  /** Bloom-filter build over xxhash64 values — Spark's own
    * runtime-filter aggregate (`BloomFilterAggregate`, the expression
    * behind `spark.sql.optimizer.runtime.bloomFilter`), reached
    * through the shim because Spark registers it for optimizer use
    * only. The result is a single binary sketch whose size is fixed
    * by `numBits` regardless of input cardinality — the broadcastable
    * stand-in for a probe set too big to broadcast exactly. */
  def bloomFilterAgg(hashed: Column, expectedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.GraftShims.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.Literal
    column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(expression(hashed),
        Literal(expectedItems), Literal(numBits))
      .toAggregateExpression())
  }

  /** Membership probe against [[bloomFilterAgg]]'s sketch (may
    * false-positive, never false-negative — callers keep an exact
    * verify behind it when the answer must be exact). `might_contain`
    * requires its sketch side to be constant-foldable, so the 1-row
    * sketch frame rides in as a scalar subquery — the same shape
    * Spark's own `InjectRuntimeFilter` builds. */
  def mightContain(sketch: org.apache.spark.sql.DataFrame, hashed: Column): Column = {
    import org.apache.spark.sql.GraftShims.{column, expression, logicalPlan}
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(logicalPlan(sketch)),
      expression(hashed)))
  }

  /** Word k-shingle array in one codegen'd pass (see [[Shingles]]). */
  def shingles(tokens: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftShims.{column, expression}
    column(Shingles(expression(tokens), k))
  }

  /** MinHash signature array in one codegen'd pass (see [[MinhashHex]]):
    * one md5 per shingle, rotations compared in place. */
  def minhashHex(shingles: Column, components: Int = 4): Column = {
    import org.apache.spark.sql.GraftShims.{column, expression}
    column(MinhashHex(expression(shingles), components))
  }

  /** Repetition-signal triple `[n, n_distinct, top_bigram_count]` in
    * one codegen'd hash pass (see [[BigramStats]]). */
  def bigramStats(tokens: Column): Column = {
    import org.apache.spark.sql.GraftShims.{column, expression}
    column(BigramStats(expression(tokens)))
  }

  /** Per-bigram 16-way md5 feature buckets in one codegen'd pass (see
    * [[BigramBuckets]]) — the DSIR hashed-feature extractor. */
  def bigramBuckets(tokens: Column): Column = {
    import org.apache.spark.sql.GraftShims.{column, expression}
    column(BigramBuckets(expression(tokens)))
  }

  /** Per-profile stopword occurrence counts in one codegen'd pass over
    * a token array (see [[StopwordCounts]]) — replaces one interpreted
    * `filter` HOF per profile on the language-ID/quality hot path. */
  def stopwordCounts(tokens: Column, profiles: Seq[Seq[String]]): Column = {
    import org.apache.spark.sql.GraftShims.{column, expression}
    column(StopwordCounts(expression(tokens), profiles))
  }

  /** SHA-1 in base-36 — the encoding MediaWiki stores in `<sha1>`
    * (SURVEY.md §2.A10). A Scala UDF (not on any oracle path). */
  val sha1Base36 = udf { (s: String) =>
    if (s == null) null
    else {
      val d = java.security.MessageDigest.getInstance("SHA-1")
        .digest(s.getBytes("UTF-8"))
      new java.math.BigInteger(1, d).toString(36)
    }
  }
}
