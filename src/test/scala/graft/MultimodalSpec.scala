package graft

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.{Frame, MediaRow}
import org.scalatest.funsuite.AnyFunSuite

/** Drives the partition-parallel decode path (MultimodalOps.decodeFrames
  * + StubCodec) and pins it to the expression-level frame math the
  * mm_frame_sample oracle checks — the two must agree.
  */
class MultimodalSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("decodeFrames emits every stride-th 16-byte frame with correct offsets") {
    val payload = Array.fill[Byte](50)(7) // 50 bytes -> 4 frames (16,16,16,2)
    val media = Seq(MediaRow(1L, payload)).toDS()
    val frames = MultimodalOps.decodeFrames(media, stride = 2).collect().sortBy(_.frame_idx)
    assert(frames.toSeq === Seq(
      Frame(1L, 0L, 0L, 16L),
      Frame(1L, 2L, 32L, 16L))) // idx 2 starts at 32; last full frame
  }

  test("decodeFrames handles payloads smaller than one frame") {
    val media = Seq(MediaRow(2L, Array[Byte](1, 2, 3))).toDS()
    val frames = MultimodalOps.decodeFrames(media, stride = 4).collect()
    assert(frames.toSeq === Seq(Frame(2L, 0L, 0L, 3L)))
  }

  test("decodeFrames agrees with the mm_frame_sample expression plan") {
    val dir = "/root/testdata/sf0.001"
    val media = MultimodalOps.pack(spark, dir)
      .as[(Long, Array[Byte])].map { case (id, bytes) => MediaRow(id, bytes) }
    val viaCodec = MultimodalOps.decodeFrames(media, MultimodalOps.SampleStride)
      .select("doc_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaExpr = SparkEntry.queries("mm_frame_sample")(spark, dir)
      .select("doc_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaCodec === viaExpr)
    assert(viaCodec.nonEmpty)
  }

  test("stub codec dims are deterministic on payload bytes") {
    val (w1, h1) = MultimodalOps.StubCodec.decodeMeta("abc".getBytes)
    val (w2, h2) = MultimodalOps.StubCodec.decodeMeta("abc".getBytes)
    assert((w1, h1) === (w2, h2))
    assert(w1 >= 1 && w1 <= 640 && h1 >= 1 && h1 <= 480)
  }
}
