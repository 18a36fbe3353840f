package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** HyperLogLog distinct-count sketch as a `TypedImperativeAggregate`
  * (SURVEY.md §2.B37) — the custom-aggregation-buffer surface for
  * state that is not a Spark SQL type: the buffer is the raw
  * 2^precision register array, shipped between partial and final
  * aggregation as bytes.
  *
  * Why this exists next to `approx_count_distinct` (q27): the built-in
  * answers the query, but a 100 TB pipeline also needs the SKETCH as a
  * value — persisted per partition/day and re-merged later without
  * touching the raw data. `merge` here is exactly that reusable
  * register-max, and the update/merge algebra is commutative,
  * associative and idempotent, so estimates are independent of
  * partitioning and execution order (deterministic for a fixed input
  * set — unlike sampling-based estimators).
  *
  * Standard Flajolet HLL: register j = max leading-zero rank of the
  * 64-bit xxhash suffix among values routed to j by the top
  * `precision` hash bits; harmonic-mean estimate with the small-range
  * linear-counting correction. Relative error ≈ 1.04/√(2^precision)
  * (1.6% at the default p=12; 4 KiB per group).
  */
case class HllSketchAgg(
    child: Expression,
    precision: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(precision >= 7 && precision <= 16,
    s"graft_hll_distinct precision must be in [7,16], got $precision")

  private val m: Int = 1 << precision

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val idx = (h >>> (64 - precision)).toInt
      val rest = h << precision
      // rank over the remaining 64-p bits; an all-zero suffix gets the
      // max rank (65-p), the standard convention
      val rank = if (rest == 0L) 65 - precision
        else java.lang.Long.numberOfLeadingZeros(rest) + 1
      if (rank > buffer(idx)) buffer(idx) = rank.toByte
    }
    buffer
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Byte]): Any = {
    var z = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      z += java.lang.Math.pow(2.0, -buffer(i).toDouble)
      if (buffer(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m) // m >= 128 constant
    val raw = alpha * m.toDouble * m.toDouble / z
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.rint(est).toLong
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}
