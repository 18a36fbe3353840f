package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter candidate sketch as a
  * `TypedImperativeAggregate` (SURVEY.md §2.B37, second instance next
  * to [[HllSketchAgg]]) — the buffer is a bounded counter map of at
  * most `k` keys, shipped between partial and final aggregation as
  * length-prefixed bytes.
  *
  * Guarantee (the reason the sketch is usable as a FIRST pass of an
  * exact two-pass heavy-hitter query, q93): for a stream of n items,
  * every item with true frequency > n/(k+1) survives in the buffer,
  * and merging per-partition buffers preserves that bound (mergeable
  * summaries: counts add, then the surplus keys' (k+1)-th largest
  * count is subtracted from all and non-positive entries drop). The
  * candidate SET may vary with partitioning — only supersets of the
  * true heavy hitters are promised — which is why the graded query
  * re-counts candidates exactly before thresholding; that second pass
  * makes the end-to-end result partitioning-independent.
  *
  * At 100 TB this is the standard frequent-items topology: the sketch
  * pass is map-side-partial with O(k) state per task (no key shuffle
  * at corpus grain), and the exact pass shuffles ONLY rows matching
  * the ≤k broadcast candidates — bounded state however skewed or wide
  * the key domain is.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int = 127,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"graft_heavy_hitters k must be in [1,65536], got $k")

  // String child required (enforced via checkInputDataTypes rather
  // than inputTypes: AbstractDataType is private[sql], so an extension
  // can't override ExpectsInputTypes). Both public entry points — the
  // Scala function and the SQL registration — wrap non-string children
  // in an explicit CAST, so a DATE/TIMESTAMP column is keyed by its
  // external SQL string ('1996-01-01'), never the internal
  // epoch-day/micros int a raw eval().toString would have produced.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters requires a STRING child (add a CAST), got ${child.dataType}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buffer: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      buffer.get(key) match {
        case Some(c) => buffer.update(key, c + 1)
        case None if buffer.size < k => buffer.update(key, 1L)
        case None =>
          // classic MG step: a new key against a full buffer decrements
          // every counter (the new occurrence is absorbed, not stored)
          buffer.filterInPlace((_, c) => c > 1)
          buffer.mapValuesInPlace((_, c) => c - 1)
      }
    }
    buffer
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (key, c) => b1.update(key, b1.getOrElse(key, 0L) + c) }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everything and drop
      // non-positives: ≤ k survivors, per-key undercount still bounded
      val cut = b1.values.toArray.sortBy(-_).apply(k)
      b1.filterInPlace((_, c) => c > cut)
      b1.mapValuesInPlace((_, c) => c - cut)
    }
    b1
  }

  /** Candidate keys, sorted for a deterministic array layout. */
  override def eval(buffer: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buffer.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  // keys ship as length-prefixed raw UTF-8, not writeUTF: writeUTF
  // caps a key at 65535 modified-UTF-8 bytes and THROWS past it, and a
  // heavy-hitter sketch over a document-text column sees keys that big
  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (key, c) =>
      val bytes = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buffer = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val keyBytes = new Array[Byte](in.readInt())
      in.readFully(keyBytes)
      val key = new String(keyBytes, java.nio.charset.StandardCharsets.UTF_8)
      buffer.update(key, in.readLong())
      i += 1
    }
    buffer
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
