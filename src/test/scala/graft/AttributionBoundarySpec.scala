package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.WindowedOps

/** ADVICE_r15 (medium): q209's time-decay exponent at the INCLUSIVE
  * 7-day lookback boundary. The band join keeps Δ ≤ 7 days, so a touch
  * landing exactly on the boundary has ⌊Δdays⌋ = 7 and the unclamped
  * exponent 6 − 7 = −1 — which Spark's shiftleft MASKS (1L << 63 =
  * Long.MIN_VALUE, poisoning the purchase's whole weight vector) while
  * DuckDB's << does not: a latent cross-engine hash break that no
  * corpus row happened to exercise. This fixture pins the clamped
  * semantics with a touch at EXACTLY purchase_ts − 7 days. */
class AttributionBoundarySpec extends AnyFunSuite with LocalSparkSuite {

  test("q209 decay weight at the exact 7-day boundary is clamped, not masked") {
    val dir = Files.createTempDirectory("q209boundary")
    try {
      import scala.jdk.CollectionConverters._
      val t0 = Timestamp.valueOf("2024-06-15 12:00:00")
      val us = t0.getTime * 1000L
      def at(deltaUs: Long) = new Timestamp((us - deltaUs) / 1000L)
      val day = 86400L * 1000000L
      val rows = Seq(
        Row(1L, t0, 100L, "purchase", 10.00, ""),
        // exactly 7 days before: ⌊Δdays⌋ = 7 → exponent clamps to 0
        Row(2L, at(7L * day), 100L, "click", 0.0, ""),
        // 1 day before: ⌊Δdays⌋ = 1 → num = 2^5 = 32
        Row(3L, at(1L * day), 100L, "view", 0.0, ""))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("props",
          org.apache.spark.sql.types.StringType)))
      spark.createDataFrame(rows.asJava, schema)
        .repartition(1).write.mode("overwrite")
        .parquet(dir.resolve("events.parquet").toString)

      val out = WindowedOps.positionDecayAttribution(spark, dir.toString)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap

      // both touches join (Δ ≤ 7d inclusive); n = 2 → position 0.5 each
      assert(out.keySet === Set("click", "view"))
      val (nClick, posClick, decClick) = out("click")
      val (nView, posView, decView) = out("view")
      assert(nClick === 1L && nView === 1L)
      assert(math.abs(posClick - 5.0) < 1e-9)
      assert(math.abs(posView - 5.0) < 1e-9)
      // m = 2^0 + 2^5 = 33: boundary touch gets round(1/33, 6) of the
      // value, the day-1 touch round(32/33, 6). An unclamped masked
      // shift would have produced num = Long.MinValue here instead.
      assert(math.abs(decClick - 10.00 * 0.030303) < 1e-6)
      assert(math.abs(decView - 10.00 * 0.969697) < 1e-6)
      // total decay credit is conserved (sums to the purchase value)
      assert(math.abs(decClick + decView - 10.00) < 1e-4)
    } finally graft.ops.StreamGradedOps.deleteQuietly(dir)
  }
}
