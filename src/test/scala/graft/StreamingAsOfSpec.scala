package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.AsOfRec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** The STREAMING as-of join (StatefulOps.asofStream) — the streaming
  * twin of the native batch operator. Pins:
  *
  *  1. INCREMENTAL EQUIVALENCE: out-of-order micro-batches under a
  *     real 10-minute watermark — in-batch shuffling plus cross-batch
  *     stragglers that stay inside the allowed lateness — converge to
  *     exactly the batch native operator's output
  *     (graft.plans.AsOfJoinOps.asof) on the same data. Lefts that
  *     arrive before their watermark passes WAIT in state and are
  *     flushed by the event-time timeout, so the comparison is total,
  *     not best-effort.
  *  2. BOUNDED STATE: one state row per key (the compacted postings +
  *     waiting window live INSIDE the row), so the state-store row
  *     count tracks active keys, never history.
  *
  * The batch-mode flush dial is certified separately by the
  * `q_asof_stream` oracle row against DuckDB's ASOF JOIN.
  */
class StreamingAsOfSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  // (fixture built arithmetically — no RNG, reshuffled deterministically)
  private def minuteTs(minute: Int): Timestamp =
    new Timestamp(Timestamp.valueOf("2024-03-01 10:00:00").getTime + minute * 60000L)

  /** users 1..12; purchases on a per-user stride, clicks denser —
    * includes click-at-purchase-instant ties (inclusive semantics) and
    * users with clicks before any purchase (no-match lefts).
    */
  private def fixture: Seq[AsOfRec] = {
    val users = 1L to 12L
    val purchases = for {
      u <- users
      m <- (u % 7).toInt to 89 by (5 + (u % 3)).toInt
    } yield AsOfRec(u, minuteTs(m), is_right = true, 0L, 1000L + u * 100 + m)
    val clicks = for {
      u <- users
      m <- 0 to 89 by (2 + (u % 2)).toInt
    } yield AsOfRec(u, minuteTs(m), is_right = false, 5000L + u * 100 + m, 0L)
    purchases ++ clicks
  }

  /** Deterministic in-batch shuffle: order by a hash of the record. */
  private def scramble(rs: Seq[AsOfRec]): Seq[AsOfRec] =
    rs.sortBy(r => (r.event_id * 2654435761L + r.purchase_id * 40503L + r.ts.getTime) % 9973)

  test("out-of-order micro-batches under a watermark converge to the batch native operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = fixture
    def minute(r: AsOfRec): Int =
      ((r.ts.getTime - minuteTs(0).getTime) / 60000L).toInt
    // batch windows with stragglers that stay within the 10-minute
    // lateness allowance: after batch N (max minute 29/59), the
    // watermark is 19/49, so stragglers from minute >= 21/51 are on time
    val b1 = scramble(all.filter(minute(_) <= 29))
    val b2 = scramble(all.filter(r => minute(r) >= 30 && minute(r) <= 59)
      ++ Seq.empty) // stragglers below are re-sent duplicates-free by construction
    val b3 = scramble(all.filter(r => minute(r) >= 60))
    // move a few boundary records one batch later (cross-batch
    // disorder): minute 25-29 arrive with batch 2, minute 55-59 with
    // batch 3 — both above the respective watermarks (19, 49)
    val late1 = b1.filter(minute(_) >= 25)
    val early1 = b1.filterNot(minute(_) >= 25)
    val late2 = b2.filter(minute(_) >= 55)
    val early2 = b2.filterNot(minute(_) >= 55)

    val ms = MemoryStream[AsOfRec]
    val q = StatefulOps.asofStream(ms.toDS(), watermarkDelay = Some("10 minutes"))
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      ms.addData(early1: _*); q.processAllAvailable()
      ms.addData(scramble(late1 ++ early2): _*); q.processAllAvailable()
      ms.addData(scramble(late2 ++ b3): _*); q.processAllAvailable()
      // sentinel right row far in the future: pushes the watermark past
      // every waiting left so the event-time timeouts flush them all
      ms.addData(AsOfRec(1L, minuteTs(120), is_right = true, 0L, 9999L))
      q.processAllAvailable()

      val got = spark.table("asof_stream")
        .select("event_id", "user_id", "ts", "purchase_id", "purchase_ts")
        .collect().map(_.toString).sorted

      val recsDf = all.toDF()
      val p = recsDf.filter(col("is_right"))
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("purchase_id"))
      val c = recsDf.filter(!col("is_right"))
        .select(col("event_id"), col("user_id"), col("ts"))
      val want = graft.plans.AsOfJoinOps
        .asof(c, p, "user_id", "p_user", "ts", "p_ts")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("purchase_id"), col("p_ts").as("purchase_ts"))
        .collect().map(_.toString).sorted

      assert(got.length === want.length,
        s"row counts differ: streaming=${got.length} batch=${want.length}")
      assert(got === want)

      // bounded state: one state row per key — 12 fixture users plus
      // the sentinel's key; never O(events)
      val maxStateRows = q.recentProgress
        .flatMap(p0 => Option(p0.stateOperators).toSeq.flatten)
        .map(_.numRowsTotal).maxOption.getOrElse(0L)
      assert(maxStateRows <= 13L,
        s"state rows ($maxStateRows) exceed the active-key bound")
    } finally q.stop()
  }

  test("as-of state survives a checkpointed query RESTART") {
    // Three recovery hazards in one fixture (file source + parquet
    // sink; the memory sink cannot recover from a checkpoint):
    //  - a WAITING left (t past the run-1 watermark) must survive the
    //    restart and match a right that only arrives in run 2;
    //  - the restored rights must be the COMPACTED set (latest
    //    at-or-under the watermark, everything after) — if compaction
    //    kept the wrong posting the run-2 match comes out wrong;
    //  - key 2's waiting left gets NO run-2 data at all: only the
    //    re-registered event-time TIMEOUT can flush it.
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft-asof-restart").toString
    val (src, ckpt, out) = (s"$root/src", s"$root/ckpt", s"$root/out")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    def r(u: Long, m: Int, pid: Long) = AsOfRec(u, minuteTs(m), is_right = true, 0L, pid)
    def l(u: Long, m: Int, eid: Long) = AsOfRec(u, minuteTs(m), is_right = false, eid, 0L)
    def writeBatch(recs: AsOfRec*): Unit =
      spark.createDataset(recs)(org.apache.spark.sql.Encoders.product)
        .write.mode("append").parquet(src)
    def run(): Unit = {
      val q = StatefulOps.asofStream(
        spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
          .as[AsOfRec], watermarkDelay = Some("10 minutes"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "streaming query timed out")
    }
    // run 1: watermark ends at minute 25 (max ts 35 - 10). The left at
    // minute 5 emits (matching pid=100); both lefts at minute 30 wait.
    writeBatch(r(1, 2, 100L), r(1, 10, 101L), l(1, 5, 1L),
      l(1, 30, 2L), r(1, 35, 102L), r(2, 1, 200L), l(2, 30, 3L))
    run()
    val afterRun1 = spark.read.parquet(out).count()
    assert(afterRun1 === 1L, s"run 1 should emit exactly the minute-5 left, got $afterRun1")
    // run 2 (fresh query instance, same checkpoint): a late-but-on-time
    // right at minute 28 lands BEFORE the waiting left's instant, and a
    // far sentinel pushes the watermark past every waiting left
    writeBatch(r(1, 28, 103L), r(1, 60, 104L))
    run()
    val got = spark.read.parquet(out)
      .select("event_id", "purchase_id", "purchase_ts")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getTimestamp(2))).sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 100L, minuteTs(2)),   // run 1, matched pre-restart
      (2L, 103L, minuteTs(28)),  // waiting left + post-restart right
      (3L, 200L, minuteTs(1))),  // timeout-flushed on a silent key
      s"restart broke the as-of state round-trip: $got")
  }

  test("idle-TTL evicts a silent key's postings; a post-eviction probe degrades to no-match") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[AsOfRec]
    val q = StatefulOps.asofStream(ms.toDS(),
      watermarkDelay = Some("10 minutes"), idleTtlMinutes = Some(30L))
      .writeStream.format("memory").queryName("asof_ttl")
      .outputMode("append").start()
    try {
      def stateRows: Long = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
      // key 1: one posting, then silence. key 2: stays active.
      ms.addData(
        AsOfRec(1L, minuteTs(0), is_right = true, 0L, 100L),
        AsOfRec(2L, minuteTs(0), is_right = true, 0L, 200L))
      q.processAllAvailable()
      // key 2 keeps the watermark moving; key 1 idles past 30 minutes
      // of event time (wm reaches 80 - 10 = 70 > 0 + 30)
      ms.addData(AsOfRec(2L, minuteTs(80), is_right = true, 0L, 201L))
      q.processAllAvailable()
      // key 1's TTL timeout fires on this trigger's watermark
      ms.addData(AsOfRec(2L, minuteTs(81), is_right = true, 0L, 202L))
      q.processAllAvailable()
      assert(stateRows === 1L,
        s"idle key 1 not evicted: $stateRows state rows (want key 2 only)")
      // a probe of the evicted key degrades to no-match (the documented
      // trade); an active-key probe still matches
      ms.addData(
        AsOfRec(1L, minuteTs(85), is_right = false, 11L, 0L),
        AsOfRec(2L, minuteTs(85), is_right = false, 22L, 0L))
      q.processAllAvailable()
      ms.addData(AsOfRec(2L, minuteTs(120), is_right = true, 0L, 203L)) // flush wm
      q.processAllAvailable()
      val byEid = spark.table("asof_ttl")
        .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
      assert(byEid(11L).isEmpty, "evicted key must probe to no-match")
      assert(byEid(22L).contains(202L), "active key must still match its latest posting")
    } finally q.stop()
  }

  test("flush mode equals the batch operator on the events fixture") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("event_id").as("purchase_id"))
    val recs = p
      .select(col("user_id"), col("ts"), lit(true).as("is_right"),
        lit(0L).as("event_id"), col("purchase_id"))
      .unionByName(ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(false).as("is_right"),
          col("event_id"), lit(0L).as("purchase_id")))
    val got = StatefulOps.asofStream(recs.as[AsOfRec], flush = true)
      .toDF().select("event_id", "user_id", "ts", "purchase_id", "purchase_ts")
      .collect().map(_.toString).sorted
    val want = graft.plans.AsOfJoinOps.asof(
      ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts")),
      p.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("purchase_id")),
      "user_id", "p_user", "ts", "p_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("purchase_id"), col("p_ts").as("purchase_ts"))
      .collect().map(_.toString).sorted
    assert(got.nonEmpty && got === want)
  }
}
