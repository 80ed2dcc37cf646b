package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The staged-stream fixture contract (EventOps.timeChunks): the
  * chunks PARTITION the input — every row lands in exactly one chunk
  * (a dropped or duplicated row would silently corrupt every
  * stream-vs-batch oracle compare) — and chunk time ranges are
  * disjoint and ascending (the time-monotone arrival-order premise
  * all three staged-stream rows' correctness arguments rest on).
  */
class StreamStagingSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  test("timeChunks partitions the input exactly, in ascending time ranges") {
    val ev = Tables.load(spark, dir, "events").select("event_id", "ts")
    val (tmin, tmax) = ops.EventOps.timeBounds(ev)
    for (n <- Seq(1, 3, 7)) {
      val chunks = ops.EventOps.timeChunks(ev, n, tmin, tmax)
      assert(chunks.length === n)
      val counts = chunks.map(_._2.count())
      assert(counts.sum === ev.count(), s"n=$n: chunks dropped or duplicated rows")
      // disjoint + ascending: each chunk's max ts < next chunk's min ts
      val bounds = chunks.map(_._2.agg(min("ts"), max("ts")).head())
        .filter(!_.isNullAt(0))
        .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime))
      bounds.sliding(2).foreach {
        case Seq((_, aMax), (bMin, _)) =>
          assert(aMax < bMin, s"n=$n: chunk ranges overlap or are out of order")
        case _ => ()
      }
    }
  }

  test("a zero-row stream result reads back as an EMPTY DataFrame, not an inference error") {
    // the failure mode: foreachBatch never appends, the out dir has no
    // parquet footer, and a schema-inferring read would throw instead
    // of returning the empty result an empty stream legitimately has
    // deterministic sample: an unordered limit(50) could pick a
    // different 50 rows each re-execution (timeBounds and every chunk
    // re-run the plan), so the chunks might not partition the sample
    val ev = Tables.load(spark, dir, "events")
      .select("event_id", "ts").filter(col("event_id") < 50)
    val root = "target/staging/test_empty_stream"
    val (tmin, tmax) = ops.EventOps.timeBounds(ev)
    val src = ops.EventOps.stageChunks(root,
      ops.EventOps.timeChunks(ev, 2, tmin, tmax), tmin)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .filter(col("event_id") < 0) // nothing survives
    val out = ops.EventOps.runStreamAppend(spark, root, stream)
    assert(out.schema === ev.schema)
    assert(out.count() === 0L)
  }

  test("stageChunksOnePass stages the exact same per-file row sets as stageChunks") {
    // the one-pass tag formula ((unix_millis(ts) - tmin) div step) must
    // reproduce timeChunks' half-open filter ranges file for file —
    // including the trailing sentinel chunk and the mtime ladder the
    // file source orders batches by
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type")
    val (tmin, tmax) = ops.EventOps.timeBounds(ev)
    val sentinel = Seq(
      (-1L, new java.sql.Timestamp(tmax + 3L * 3600 * 1000), -1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val rootA = "target/staging/test_stage_old"
    val rootB = "target/staging/test_stage_new"
    ops.EventOps.stageChunks(rootA,
      ops.EventOps.timeChunks(ev, 3, tmin, tmax) :+ ("b4" -> sentinel), tmin)
    ops.EventOps.stageChunksOnePass(rootB, ev, 3, tmin, tmax, Seq(sentinel), tmin)
    (1 to 4).foreach { i =>
      val fa = new java.io.File(s"$rootA/src/b$i.parquet")
      val fb = new java.io.File(s"$rootB/src/b$i.parquet")
      assert(fa.isFile && fb.isFile, s"b$i missing")
      assert(fa.lastModified === fb.lastModified, s"b$i mtime ladder differs")
      val a = spark.read.parquet(fa.getPath)
      val b = spark.read.parquet(fb.getPath)
      assert(a.schema.fieldNames.toSeq === b.schema.fieldNames.toSeq,
        s"b$i column order differs")
      assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L,
        s"b$i row multisets differ")
    }
  }

  test("every fixture row is on-time under any monotone chunking (boundary rows included)") {
    // the max-ts row must land in the LAST chunk (the half-open range
    // arithmetic adds +1 per cut; an off-by-one here would silently
    // drop the final row into no chunk)
    val ev = Tables.load(spark, dir, "events").select("event_id", "ts")
    val (tmin, tmax) = ops.EventOps.timeBounds(ev)
    val last = ops.EventOps.timeChunks(ev, 3, tmin, tmax).last._2
    val lastMax = last.agg(max("ts")).head().getTimestamp(0).getTime
    assert(lastMax === tmax, "the max-timestamp row fell outside every chunk")
  }
}
