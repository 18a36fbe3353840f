package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Quantile sketch as a `TypedImperativeAggregate` (SURVEY.md §2.B37,
  * fourth instance) — an HDR-histogram-style LOGARITHMIC INTEGER
  * histogram over non-negative longs, completing the classic sketch
  * trio next to [[HllSketchAgg]] (distinct count) and [[MisraGriesAgg]]
  * (heavy hitters).
  *
  * Bucketing: a value v > 0 with most-significant bit b keeps its top
  * `m` mantissa bits — shift s = max(b-m, 0), index = (s << m) +
  * (v >> s). Values below 2^(m+1) are exact; above, the bucket width
  * is 2^s at magnitude ≥ 2^(m+s), so the rank-q estimate (bucket
  * midpoint) carries relative error ≤ 2^-(m+1) (< 0.4% at the default
  * m = 7) while the RANKS themselves are exact (bucket counts are
  * exact). Buffer size is bounded by the VALUE RANGE, not the input
  * cardinality: ≤ (64-m)·2^m indexes ≈ 7.3k for the full long domain,
  * typically a few hundred.
  *
  * Unlike KLL/t-digest (random or merge-order-dependent), every step
  * here — index arithmetic, count addition, ascending-index rank walk
  * — is deterministic and commutative, so the estimate is
  * PARTITIONING-INDEPENDENT (asserted by LogHistogramSpec at 1 vs 32
  * partitions), and, because the bucketing is pure integer bit
  * arithmetic, the whole sketch replays BIT-EXACTLY in ANSI-ish SQL
  * (DuckDB: `length(bin(v))` recovers the msb, `>>`/`<<` the rest) —
  * the suite's first oracle-backed sketch query (q110), where the HLL
  * and MG queries are rows-only by contract.
  *
  * At 100 TB this is the percentile topology that needs no sort and
  * no per-group state explosion: map-side partial histograms merge by
  * vector addition, the final walk is O(buckets), and latency-style
  * columns (prices, durations, sizes) fit the log buckets' relative
  * error contract exactly.
  *
  * Negative or null inputs: nulls are skipped (SQL aggregate
  * convention); negatives clamp to bucket 0 — callers quantizing
  * signed data should offset first.
  */
case class LogHistogramAgg(
    child: Expression,
    quantiles: Seq[Double],
    m: Int = 7,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]]
    with UnaryLike[Expression] {

  require(m >= 1 && m <= 16, s"graft_log_percentiles m must be in [1,16], got $m")
  require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q <= 1),
    s"graft_log_percentiles quantiles must be in (0,1], got $quantiles")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_log_percentiles requires a BIGINT child (add a CAST), got ${child.dataType}")
  }

  private def indexOf(v: Long): Long = LogHistogramAgg.indexOf(v, m)
  private def estimateOf(index: Long): Long = LogHistogramAgg.estimateOf(index, m)

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buffer: mutable.LongMap[Long],
      input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val idx = indexOf(v.asInstanceOf[Long])
      buffer.update(idx, buffer.getOrElse(idx, 0L) + 1L)
    }
    buffer
  }

  override def merge(b1: mutable.LongMap[Long],
      b2: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b2.foreach { case (idx, c) => b1.update(idx, b1.getOrElse(idx, 0L) + c) }
    b1
  }

  /** One rank walk over ascending indexes serves every requested
    * quantile: rank_q = ceil(q·n), estimate = midpoint of the first
    * bucket whose cumulative count reaches the rank. */
  override def eval(buffer: mutable.LongMap[Long]): Any = {
    val n = buffer.valuesIterator.sum
    val out = Array.fill[Any](quantiles.size)(0L)
    if (n == 0L) return new GenericArrayData(out)
    val idxs = buffer.keysIterator.toArray.sorted
    val ranks = quantiles.map(q => math.ceil(q * n).toLong)
    var qi = 0
    while (qi < quantiles.size) {
      val rank = math.max(ranks(qi), 1L)
      var cum = 0L
      var i = 0
      var est = 0L
      var found = false
      while (i < idxs.length && !found) {
        cum += buffer(idxs(i))
        if (cum >= rank) { est = estimateOf(idxs(i)); found = true }
        i += 1
      }
      out(qi) = est
      qi += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: mutable.LongMap[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (idx, c) => out.writeLong(idx); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buffer = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { buffer.update(in.readLong(), in.readLong()); i += 1 }
    buffer
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_log_percentiles"

  override def withNewMutableAggBufferOffset(newOffset: Int): LogHistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LogHistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LogHistogramAgg =
    copy(child = newChild)
}

/** The bucket arithmetic, exposed for algebraic property tests
  * (GraftProps): pure integer functions of (value, m). */
object LogHistogramAgg {
  def indexOf(v: Long, m: Int): Long = {
    if (v <= 0) return 0L
    val b = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val s = math.max(b - m, 0)
    (s.toLong << m) + (v >> s)
  }

  /** Bucket-midpoint representative (exact for index < 2^(m+1)). */
  def estimateOf(index: Long, m: Int): Long = {
    val s = math.max((index >> m) - 1, 0L).toInt
    ((index - (s.toLong << m)) << s) + ((1L << s) >> 1)
  }
}
