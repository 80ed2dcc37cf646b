package graft

import graft.ops.MergeOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** The continuous face of the reference pipeline: the SAME
  * MergeOps.coalesceMerge plan runs with a STREAMING primary against
  * the static (deduped, broadcast) secondary — a stream-static
  * left-outer join. No streaming-specific merge code exists; this spec
  * proves the one kernel serves both execution modes, emitting
  * identical rows.
  */
class StreamingMergeSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val root = Files.createTempDirectory("graft-stream-merge").toString

  private val pSchema = StructType(Seq(
    StructField("id", LongType), StructField("qty", DoubleType),
    StructField("note", StringType)))
  private val sSchema = StructType(Seq(
    StructField("id", LongType), StructField("qty", DoubleType),
    StructField("region", StringType)))

  test("streaming coalesceMerge == batch coalesceMerge, row for row") {
    val primary = spark.createDataFrame(Seq(
      Row(1L, 10.0, "a"), Row(2L, null, "b"), Row(3L, Double.NaN, "c"),
      Row(9L, 90.0, "unmatched")).asJava, pSchema)
    primary.write.mode("overwrite").json(s"$root/p")
    val secondary = spark.createDataFrame(Seq(
      Row(1L, 111.0, "east"), Row(2L, 222.0, "west"), Row(2L, 223.0, "dup"),
      Row(3L, 333.0, "north")).asJava, sSchema)

    val stream = spark.readStream.schema(pSchema).json(s"$root/p")
    val q = MergeOps.coalesceMerge(stream, secondary, "id")
      .writeStream.format("memory").queryName("stream_merge")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "streaming query timed out")

    val got = spark.table("stream_merge").collect().map(_.toString).sorted
    val want = MergeOps.coalesceMerge(primary, secondary, "id")
      .collect().map(_.toString).sorted
    assert(got.nonEmpty)
    assert(got === want)
    // spot semantics through the stream: null and NaN filled, dup
    // secondary ignored, unmatched primary padded with null region
    val byId = spark.table("stream_merge").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).getDouble(1) === 222.0)
    assert(byId(3L).getDouble(1) === 333.0)
    assert(byId(9L).isNullAt(3))
  }
}
