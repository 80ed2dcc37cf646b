package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `Tables.load("events")` against fixture-generator drift.
  *
  * The driver regenerates `events.parquet` between rounds and has already
  * shipped two distinct encodings for `ts` — int64 TIMESTAMP(NANOS) (rounds
  * 1-5) and TIMESTAMP(MICROS, isAdjustedToUTC=false) i.e. TIMESTAMP_NTZ
  * (round 6), the latter silently breaking 29 queries when the loader
  * hard-assumed nanos. This spec writes the same logical rows in every
  * encoding Spark can produce locally and asserts the loader normalizes all
  * of them to identical session-TZ timestamps:
  *   - raw int64 column (what `nanosAsLong` turns TIMESTAMP(NANOS) into)
  *   - TIMESTAMP_NTZ micros (the round-6 fixture shape)
  *   - TIMESTAMP micros, isAdjustedToUTC=true
  *   - TIMESTAMP millis, isAdjustedToUTC=true
  *   - INT96 (legacy physical timestamp — decodes as TimestampType)
  * (Spark cannot write TIMESTAMP(NANOS) itself; the int64 variant is
  * byte-identical to what the nanosAsLong read path yields for it.)
  */
// Top-level so Spark can derive an Encoder (inner classes need outer scope).
private[graft] case class DriftEv(event_id: Long, tsMicros: Long, user_id: Long,
                                  event_type: String, value: Double, props: String)

class TablesDriftSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // 2024-03-01T06:30:00Z and an odd-micros value to catch unit mix-ups.
  private val microsValues = Seq(1709274600000000L, 1709274600123456L)

  private val rows = microsValues.zipWithIndex.map { case (us, i) =>
    DriftEv(i.toLong, us, 100L + i, "click", 1.5 * i, s"""{"k":$i}""")
  }

  private def writeVariant(dir: String, tsCol: org.apache.spark.sql.Column,
                           outType: Option[String]): Unit = {
    val df = rows.toDF()
      .select($"event_id", tsCol.as("ts"), $"user_id", $"event_type", $"value", $"props")
    outType.foreach(t => spark.conf.set("spark.sql.parquet.outputTimestampType", t))
    try df.repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
  }

  private def loadedMicros(dir: String): Seq[(Long, Long)] = {
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType,
      s"loader must normalize to TimestampType, got ${df.schema("ts").dataType}")
    df.select($"event_id", org.apache.spark.sql.functions.unix_micros($"ts"))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
  }

  test("events loader yields identical rows across all ts fixture encodings") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-drift").toString
    val expected = microsValues.zipWithIndex.map { case (us, i) => (i.toLong, us) }

    // int64 nanos (the nanosAsLong decode of a TIMESTAMP(NANOS) fixture)
    writeVariant(s"$base/nanos", ($"tsMicros" * 1000L).as("ts"), None)
    // TIMESTAMP_NTZ micros — the round-6 fixture shape
    writeVariant(s"$base/ntz", timestamp_micros($"tsMicros").cast(TimestampNTZType), None)
    // TIMESTAMP micros / millis, isAdjustedToUTC=true
    writeVariant(s"$base/utc_us", timestamp_micros($"tsMicros"), Some("TIMESTAMP_MICROS"))
    writeVariant(s"$base/utc_ms", timestamp_micros($"tsMicros"), Some("TIMESTAMP_MILLIS"))
    // INT96 (legacy Impala/Hive physical type; pandas/arrow writers can
    // still emit it) — decodes as TimestampType, exercising the loader's
    // pass-through branch with a fixture the micros variant doesn't
    writeVariant(s"$base/int96", timestamp_micros($"tsMicros"), Some("INT96"))

    assert(loadedMicros(s"$base/nanos") === expected)
    assert(loadedMicros(s"$base/ntz") === expected)
    assert(loadedMicros(s"$base/utc_us") === expected)
    assert(loadedMicros(s"$base/int96") === expected)
    // millis writer truncates sub-milli micros by design; compare at ms grain
    val ms = loadedMicros(s"$base/utc_ms").map { case (id, us) => (id, us / 1000) }
    assert(ms === expected.map { case (id, us) => (id, us / 1000) })
  }

  test("events loader reads the real driver fixture (whatever encoding it is)") {
    val sfDir = "/root/testdata/sf0.001"
    if (new java.io.File(s"$sfDir/events.parquet").exists()) {
      val df = Tables.load(spark, sfDir, "events")
      assert(df.schema("ts").dataType === TimestampType)
      assert(df.limit(5).count() > 0)
    }
  }

  test("events loader fails loudly on an unrecognized ts type") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-drift-bad").toString
    writeVariant(s"$base/str", lit("2024-03-01").as("ts"), None)
    val e = intercept[IllegalStateException](Tables.load(spark, s"$base/str", "events"))
    assert(e.getMessage.contains("unexpected parquet-decoded type"))
  }
}
