package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** Watermark semantics end-to-end: an append-mode windowed aggregation
  * over a checkpointed file stream, run as two available-now batches.
  * Batch 1 establishes event time; batch 2 carries one on-time and one
  * LATE event (older than watermark horizon behind the max seen time).
  * The finalized window emitted after batch 2 must count the on-time
  * rows and exclude the late one — the bounded-state contract that
  * makes event-time aggregation viable on an unbounded stream.
  */
class WatermarkSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("v", DoubleType)))

  private def ts(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  test("append-mode window finalizes via watermark and drops late data") {
    val root = Files.createTempDirectory("graft-watermark").toString
    val src = s"$root/src"
    val ckpt = s"$root/ckpt"
    val out = s"$root/out"
    Files.createDirectories(java.nio.file.Paths.get(src))

    // file sink, not memory: the memory sink cannot recover from a
    // checkpoint, and this test needs two checkpointed runs
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"), sum("v").as("total"))
        .select(col("window.start").as("w"), col("n"), col("total"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "streaming query timed out")
    }

    // batch 1: three events in the 10:00 window, one at 11:05 pushing
    // max event time to 11:05 -> watermark after batch = 10:55
    spark.createDataFrame(Seq(
      Row(ts(0), 1.0), Row(ts(10), 2.0), Row(ts(20), 4.0),
      Row(Timestamp.valueOf("2026-01-01 11:05:00"), 8.0)).asJava, schema)
      .write.mode("append").parquet(src)
    run()

    // batch 2: one LATE event for the (closed) 10:00 window and one
    // on-time event at 11:10
    spark.createDataFrame(Seq(
      Row(ts(25), 100.0), // late: 10:25 < watermark 10:55 -> must be dropped
      Row(Timestamp.valueOf("2026-01-01 11:10:00"), 16.0)).asJava, schema)
      .write.mode("append").parquet(src)
    run()

    val got = spark.read.parquet(out).collect()
      .map(r => r.getTimestamp(0).toString -> (r.getLong(1), r.getDouble(2))).toMap
    // the 10:00-10:30 window was finalized after batch 1's watermark
    // passed its end; the late 100.0 must NOT appear in it
    assert(got.contains("2026-01-01 10:00:00.0"), s"window not emitted: $got")
    assert(got("2026-01-01 10:00:00.0") === ((3L, 7.0)),
      s"late event leaked into finalized window: $got")
  }
}
