package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stateful semantics behind q_stream_join that the batch oracle
  * cannot observe: a match whose two sides arrive in DIFFERENT
  * micro-batches (the state-store probe), watermark-driven state
  * eviction (the property that bounds memory on an unbounded stream),
  * and the inner join's eager emission (no watermark wait on output).
  */
class StreamStreamJoinSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def minuteTs(m: Int): java.sql.Timestamp =
    new java.sql.Timestamp(1700000000000L + m * 60000L)

  case class V(view_id: Long, user_id: Long, view_ts: java.sql.Timestamp)
  case class C(click_id: Long, click_user: Long, click_ts: java.sql.Timestamp)

  test("cross-batch match, eager emission, and watermark eviction") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vs = MemoryStream[V]
    val cs = MemoryStream[C]
    val joined = vs.toDF().withWatermark("view_ts", "10 minutes")
      .join(cs.toDF().withWatermark("click_ts", "10 minutes"), expr(
        """user_id = click_user AND
          |click_ts >= view_ts AND
          |click_ts <= view_ts + interval 60 minutes""".stripMargin))
      .select($"view_id", $"click_id", $"user_id")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      def rows = spark.table("ss_join").as[(Long, Long, Long)].collect().sorted.toSeq

      // batch 1: a view for user 1 and an unmatched click for user 2
      vs.addData(V(1L, 1L, minuteTs(0)))
      cs.addData(C(10L, 2L, minuteTs(0)))
      q.processAllAvailable()
      assert(rows === Seq.empty, "nothing should match yet")

      // batch 2: the click arrives 30 minutes later — the view must be
      // probed OUT OF STATE, and the match emits in this batch (inner
      // join: no watermark wait on emission)
      cs.addData(C(11L, 1L, minuteTs(30)))
      q.processAllAvailable()
      assert(rows === Seq((1L, 11L, 1L)), "cross-batch match must emit eagerly")

      // batch 3: a far-future in-batch pair advances both watermarks to
      // minute 290 and must also match (same-batch path)
      vs.addData(V(2L, 3L, minuteTs(300)))
      cs.addData(C(12L, 3L, minuteTs(300)))
      q.processAllAvailable()
      // batch 4: nudge both streams so the minute-290 watermark is
      // APPLIED to state cleanup (eviction runs on the batch after the
      // watermark advances)
      vs.addData(V(3L, 99L, minuteTs(301)))
      cs.addData(C(13L, 98L, minuteTs(301)))
      q.processAllAvailable()
      assert(rows === Seq((1L, 11L, 1L), (2L, 12L, 3L)))

      // view 1 (window closed at minute 60 << watermark 290) must have
      // been EVICTED from state, not retained forever
      val removed = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsRemoved).sum
      assert(removed > 0L, "watermark never evicted any state rows")

      // batch 5: a click inside view 1's join window but far behind the
      // watermark is LATE input — dropped, not matched against evicted
      // state (this is the eviction contract, observed from output)
      cs.addData(C(14L, 1L, minuteTs(45)))
      q.processAllAvailable()
      assert(rows === Seq((1L, 11L, 1L), (2L, 12L, 3L)),
        "a late click must not resurrect evicted view state")
    } finally q.stop()
  }
}
