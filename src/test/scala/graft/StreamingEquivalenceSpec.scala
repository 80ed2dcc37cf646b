package graft

import graft.streaming.EventWindows
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Asserts the Structured Streaming execution of EventWindows equals
  * the batch execution of the SAME transform (which is itself
  * oracle-checked as q_events_tumbling / q_events_sliding /
  * q_events_session). Source: file stream over the staged events table;
  * sink: in-memory table, complete output mode, available-now trigger.
  */
class StreamingEquivalenceSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val staged: String = {
    val dir = Files.createTempDirectory("graft-events-staged").toString
    // Tables.load normalizes the fixture's TIMESTAMP(NANOS); re-staging
    // gives the stream reader a plain micros timestamp column.
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def batchEvents: DataFrame = spark.read.parquet(staged)

  private def streamEvents: DataFrame =
    spark.readStream.schema(batchEvents.schema).parquet(staged)

  private def runStream(name: String, transform: DataFrame => DataFrame): Array[String] = {
    val q = transform(streamEvents)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "streaming query timed out")
    spark.table(name).collect().map(_.toString).sorted
  }

  private def runBatch(transform: DataFrame => DataFrame): Array[String] =
    transform(batchEvents).collect().map(_.toString).sorted

  test("tumbling windows: streaming == batch") {
    val got = runStream("stream_tumbling", EventWindows.tumbling)
    assert(got.nonEmpty)
    assert(got === runBatch(EventWindows.tumbling))
  }

  test("sliding windows: streaming == batch") {
    val got = runStream("stream_sliding", EventWindows.sliding)
    assert(got.nonEmpty)
    assert(got === runBatch(EventWindows.sliding))
  }

  test("session windows: streaming == batch") {
    val got = runStream("stream_session", EventWindows.session)
    assert(got.nonEmpty)
    assert(got === runBatch(EventWindows.session))
  }
}
