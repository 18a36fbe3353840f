package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Pins every physical ts encoding [[Tables.events]] normalizes over,
  * against checked-in two-row fixtures (scripts/make_ts_fixtures.py)
  * so the branches stay exercised no matter which encoding the current
  * driver corpus happens to use. The driver switched encodings
  * mid-round-7 (INT64 nanos → timestamp[us]); after that switch the
  * nanos branch was live code with no living input until this spec. */
class TimestampEncodingSpec extends AnyFunSuite with LocalSparkSuite {

  private def fixture(name: String): String = {
    val url = getClass.getClassLoader.getResource(s"$name/events.parquet")
    assert(url != null, s"missing fixture $name")
    // Tables.events reads "$dir/events.parquet" — hand it the parent
    new java.io.File(url.toURI).getParentFile.getAbsolutePath
  }

  private def normalized(name: String): Seq[(Long, Long)] = {
    val df = Tables.events(spark, fixture(name))
    assert(df.schema("ts").dataType === TimestampType,
      s"$name must normalize to TimestampType")
    df.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
  }

  // the fixtures' shared logical values, µs precision (sub-second part
  // 123456/654321 chosen to catch any unit-confusion ÷/×1000 slip)
  private val expected =
    Seq((1L, 1735689600123456L), (2L, 1735776000654321L))

  test("INT64 TIMESTAMP(NANOS) decodes via the nanos branch") {
    assert(normalized("tsfix_nanos") === expected)
  }

  test("timestamp[us] without timezone (TIMESTAMP_NTZ) casts losslessly") {
    assert(normalized("tsfix_micros") === expected)
  }

  test("timestamp[us] UTC-adjusted (TimestampType) passes through") {
    assert(normalized("tsfix_tz") === expected)
  }

  test("all encodings agree bit-for-bit after normalization") {
    assert(normalized("tsfix_nanos") === normalized("tsfix_micros"))
    assert(normalized("tsfix_micros") === normalized("tsfix_tz"))
  }

  test("an unknown encoding fails fast with a diagnosis, never silently") {
    val e = intercept[IllegalArgumentException] {
      Tables.events(spark, fixture("tsfix_bad"))
    }
    assert(e.getMessage.contains("unsupported type"))
    assert(e.getMessage.contains("Tables.events"))
  }
}
