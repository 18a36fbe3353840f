package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** B36 typed UDAF demo: quantity-weighted mean price in exact integer
  * arithmetic (price scaled to 1e-4 units), so the result is
  * order-insensitive and cross-engine-deterministic like every other
  * graded aggregate. The finish division chain (num/1e4/den) mirrors
  * the oracle SQL text exactly.
  */
object WeightedMeanAgg extends Aggregator[(Double, Double), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)

  // math.round on the weight mirrors the oracle's CAST(… AS BIGINT),
  // which rounds in DuckDB — .toLong would truncate and diverge for
  // fractional weights
  override def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) =
    (b._1 + math.round(a._1 * 10000) * math.round(a._2), b._2 + math.round(a._2))

  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)

  override def finish(r: (Long, Long)): Double =
    r._1.toDouble / 10000.0 / r._2.toDouble

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
