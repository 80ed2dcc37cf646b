package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Drives the EXACT q_stream_upsert merge (EventOps.upsertEventsBatch)
  * batch-by-batch and pins the two contracts the streaming row cannot
  * state on its own: (1) sequential batches converge to the batch
  * last-write-wins answer, and (2) a REPLAYED batch — foreachBatch's
  * at-least-once re-delivery after a checkpoint restart — leaves the
  * table bit-identical (merge idempotence).
  */
class StreamingUpsertSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, Long, Double)]): DataFrame =
    rows.toDF("event_id", "tss", "user_id", "value")
      .selectExpr("event_id", "CAST(tss AS TIMESTAMP) AS ts", "user_id", "value")

  private def snapshot(table: String): Set[(Long, java.sql.Timestamp, Long, Double)] =
    spark.read.parquet(table)
      .select("user_id", "last_ts", "last_event_id", "last_value")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet

  test("sequential batches converge to last-write-wins; a replayed batch is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-upsert")
    val table = s"$root/table"
    try {
      // batch 1: users 1 and 17 (same bucket, 17 % 16 = 1) and 5
      val b1 = ev(Seq(
        (10L, "2024-01-01 10:00:00", 1L, 1.0),
        (11L, "2024-01-01 11:00:00", 1L, 2.0), // later ts wins for user 1
        (12L, "2024-01-01 10:30:00", 17L, 3.0),
        (13L, "2024-01-01 09:00:00", 5L, 4.0)))
      // batch 2: overrides user 1, ties user 5 on ts (larger event_id
      // wins), leaves 17 untouched
      val b2 = ev(Seq(
        (20L, "2024-01-02 08:00:00", 1L, 5.0),
        (21L, "2024-01-01 09:00:00", 5L, 6.0)))
      graft.ops.EventOps.upsertEventsBatch(table, b1)
      graft.ops.EventOps.upsertEventsBatch(table, b2)

      val expected = Set(
        (1L, java.sql.Timestamp.valueOf("2024-01-02 08:00:00"), 20L, 5.0),
        (17L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 12L, 3.0),
        (5L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 21L, 6.0))
      assert(snapshot(table) === expected)

      // the restart shape: the last batch is delivered AGAIN
      graft.ops.EventOps.upsertEventsBatch(table, b2)
      assert(snapshot(table) === expected, "replayed batch must be a no-op")

      // and replaying an EARLIER batch (out-of-order re-delivery) must
      // not resurrect overwritten values either — LWW absorbs it
      graft.ops.EventOps.upsertEventsBatch(table, b1)
      assert(snapshot(table) === expected, "stale replay must be absorbed")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("merge works against a file:-qualified URI (Hadoop FS probe, not java.io.File)") {
    // a scheme-qualified table path is invisible to java.io.File —
    // this pins that the existence probe goes through the Hadoop
    // FileSystem of the table's own scheme, so the second batch MERGES
    // with the first instead of silently dropping its state
    val root = java.nio.file.Files.createTempDirectory("graft-upsert-uri")
    val table = s"file://$root/table"
    try {
      graft.ops.EventOps.upsertEventsBatch(table, ev(Seq(
        (1L, "2024-01-01 10:00:00", 2L, 1.0))))
      graft.ops.EventOps.upsertEventsBatch(table, ev(Seq(
        (2L, "2024-01-01 11:00:00", 35L, 2.0))))
      assert(snapshot(table) === Set(
        (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 1.0),
        (35L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L, 2.0)),
        "state from batch 1 must survive a batch-2 merge through the URI path")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("a batch rewrites only the bucket partitions its keys touch") {
    val root = java.nio.file.Files.createTempDirectory("graft-upsert-prune")
    val table = s"$root/table"
    try {
      graft.ops.EventOps.upsertEventsBatch(table, ev(Seq(
        (1L, "2024-01-01 10:00:00", 2L, 1.0),   // bucket 2
        (2L, "2024-01-01 10:00:00", 35L, 2.0)))) // bucket 3
      val before = new java.io.File(s"$table/bucket=2").lastModified()
      Thread.sleep(1100) // parquet mtime granularity
      // touches only bucket 3
      graft.ops.EventOps.upsertEventsBatch(table, ev(Seq(
        (3L, "2024-01-02 10:00:00", 35L, 9.0))))
      assert(new java.io.File(s"$table/bucket=2").lastModified() === before,
        "untouched bucket partition must not be rewritten")
      assert(snapshot(table) === Set(
        (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 1.0),
        (35L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 3L, 9.0)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
