package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-restart proof for the symmetric stream-stream join
  * (q_stream_join's operator, via EventOps.viewClickStreamJoin): the
  * TWO-SIDED state-store buffers must round-trip through the
  * checkpoint. A view that arrives in run 1 with no partner can only
  * match a click arriving in run 2 if the recovered view-side buffer
  * still holds it — a state-encoder or watermark-recovery regression
  * silently drops exactly that match.
  */
class StreamStreamJoinSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("buffered view-side state survives a checkpointed query RESTART") {
    val root = Files.createTempDirectory("graft-ssjoin-restart").toString
    val (src, ckpt, out) = (s"$root/src", s"$root/ckpt", s"$root/out")
    Files.createDirectories(java.nio.file.Paths.get(src))

    def ev(id: Long, user: Long, min: Int, t: String) =
      (id, Timestamp.valueOf(f"2024-01-01 10:$min%02d:00"), user, t)
    def writeBatch(evs: (Long, Timestamp, Long, String)*): Unit =
      evs.toDF("event_id", "ts", "user_id", "event_type")
        .coalesce(1).write.mode("append").parquet(src)
    def run(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(src).schema).parquet(src)
      val q = ops.EventOps.viewClickStreamJoin(stream)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "streaming query timed out")
    }

    // run 1: user 1's view has no partner yet (user 2's click keeps the
    // batch non-degenerate without matching anyone). Watermark ends at
    // 10:05 - 10min = 9:55 < view_ts + 60min, so the view stays buffered.
    writeBatch(ev(1, 1, 0, "view"), ev(2, 2, 5, "click"))
    run()
    assert(!java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .anyMatch(_.toString.endsWith(".parquet")) ||
      spark.read.parquet(out).isEmpty,
      "run 1 must emit nothing — no pair matches yet")

    // run 2 (fresh query instance, same checkpoint): user 1's click at
    // 10:30 is inside [view_ts, view_ts + 60min] and must join the view
    // RECOVERED from run 1's checkpoint; user 3's pair arrives wholly
    // within run 2 as the non-recovery control.
    writeBatch(ev(3, 1, 30, "click"), ev(4, 3, 31, "view"), ev(5, 3, 40, "click"))
    run()

    val got = spark.read.parquet(out).select("view_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === Seq((1L, 3L), (4L, 5L)),
      "restart lost the buffered view-side join state")
  }

  // The LEFT OUTER variant's null emission is eviction-driven: an
  // unmatched view emits (view, null) only after the click watermark
  // passes view_ts + 60min. Batch 1 leaves user 1's view unmatched
  // (user 2's click is a different user); the batch-2 sentinels push
  // both watermarks past its window, so the terminal eviction sweep
  // (the no-data micro-batch after the sentinels) must null-emit
  // exactly that view — and ONLY it: the unmatched click must not
  // emit under a left join, and the sentinel view (never evicted, the
  // watermark stops short of its own ts) is excluded on the read-back.
  // The exclusion MUST stay outside the streaming plan: an in-plan
  // filter on user_id is pushed below the watermark operators and
  // drops the sentinels before they advance anything — asserted here
  // so the pushdown trap can't silently regress the Q row.
  test("left-outer join null-emits an unmatched view after watermark passage") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft-ssjoin-outer").toString
    val b1 = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view"),
      (2L, Timestamp.valueOf("2024-01-01 10:05:00"), 2L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val sentinel = Seq(
      (-1L, Timestamp.valueOf("2024-01-01 20:00:00"), -1L, "view"),
      (-2L, Timestamp.valueOf("2024-01-01 20:00:00"), -2L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val src = ops.EventOps.stageChunks(root, Seq("b1" -> b1, "b2" -> sentinel), 0L)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val got = ops.EventOps.runStreamAppend(spark, root,
      ops.EventOps.viewClickStreamJoin(stream, joinType = "leftOuter"))
      .filter(col("user_id") >= 0)
      .collect()
    assert(got.length === 1, s"expected exactly the null-padded view, got ${got.toSeq}")
    assert(got.head.getLong(0) === 1L && got.head.isNullAt(1),
      "the unmatched view must emit with a null click side")
  }
}
