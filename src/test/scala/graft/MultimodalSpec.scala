package graft

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.{Frame, MediaRow}
import org.scalatest.funsuite.AnyFunSuite

/** Drives the partition-parallel decode paths (MultimodalOps
  * decodeFrames/byteFrames, the image/audio codecs, and the GVID video
  * container) and pins byteFrames to the expression-level frame math
  * the mm_frame_sample oracle checks — the two must agree.
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

  test("ImageCodec emits genuine PNG bytes and the decode is a lossless roundtrip") {
    val png = MultimodalOps.ImageCodec.synthPng(42L, 7, 5)
    // PNG magic: 89 50 4E 47 0D 0A 1A 0A
    assert(png.take(8).map(_ & 0xff).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    val st = MultimodalOps.ImageCodec.decodeStats(png)
    assert((st.width, st.height) === (7, 5))
    var er = 0L; var eg = 0L; var eb = 0L
    for (y <- 0 until 5; x <- 0 until 7) {
      er += MultimodalOps.ImageCodec.pixel(42L, x, y, 0)
      eg += MultimodalOps.ImageCodec.pixel(42L, x, y, 1)
      eb += MultimodalOps.ImageCodec.pixel(42L, x, y, 2)
    }
    assert((st.sumR, st.sumG, st.sumB) === (er, eg, eb))
  }

  test("AudioCodec emits genuine RIFF/WAVE bytes and the decode is a lossless roundtrip") {
    val wav = MultimodalOps.AudioCodec.synthWav(42L)
    // RIFF container magic + WAVE form type
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val st = MultimodalOps.AudioCodec.decodeStats(wav)
    val n = MultimodalOps.AudioCodec.nFrames(42L)
    assert(st.nFrames === n.toLong)
    var sl = 0L; var sr = 0L
    var mnl = Long.MaxValue; var mxr = Long.MinValue
    for (i <- 0 until n) {
      val l = MultimodalOps.AudioCodec.sample(42L, i, 0)
      val r = MultimodalOps.AudioCodec.sample(42L, i, 1)
      sl += l; sr += r
      mnl = math.min(mnl, l); mxr = math.max(mxr, r)
    }
    assert((st.sumL, st.sumR, st.minL, st.maxR) === (sl, sr, mnl, mxr))
  }

  test("AudioCodec's direct SPI dispatch is byte/stat-identical to AudioSystem") {
    // The codec bypasses AudioSystem's synchronized per-call provider
    // resolution by dispatching to the same ServiceLoader providers
    // directly (MultimodalOps.AudioCodec fileWriters/fileReaders).
    // Pin that the bypass changes NOTHING observable: the emitted
    // container is byte-identical to AudioSystem.write's, and decoding
    // through AudioSystem.getAudioInputStream yields the same frames.
    for (id <- Seq(1L, 42L, 97L)) {
      val wav = MultimodalOps.AudioCodec.synthWav(id)
      val n = MultimodalOps.AudioCodec.nFrames(id)
      val pcm = new Array[Byte](n * 4)
      for (i <- 0 until n; ch <- 0 until 2) {
        val v = MultimodalOps.AudioCodec.sample(id, i, ch)
        pcm(i * 4 + ch * 2) = (v & 0xff).toByte
        pcm(i * 4 + ch * 2 + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      assert(java.util.Arrays.equals(wav, bos.toByteArray),
        s"doc $id: SPI-written WAV differs from AudioSystem.write's")
      val sys = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      assert(java.util.Arrays.equals(sys.readAllBytes(), pcm),
        s"doc $id: AudioSystem decodes different frames than were encoded")
    }
  }

  test("ImageCodec.readImage matches ImageIO.read's contract exactly") {
    // readImage hoists ImageIO.read's per-call registry scan (the SPI
    // list) but must be observably identical: same raster for valid
    // bytes, null when no reader claims the bytes, and the same
    // mid-stream failure when a claimant cannot finish the decode.
    for (id <- Seq(1L, 42L, 97L)) {
      val png = MultimodalOps.ImageCodec.synthPng(
        id, (id % 12 + 4).toInt, (id % 9 + 3).toInt)
      val a = MultimodalOps.ImageCodec.readImage(png)
      val b = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(a.getWidth === b.getWidth && a.getHeight === b.getHeight)
      val pa = a.getRGB(0, 0, a.getWidth, a.getHeight, null, 0, a.getWidth)
      val pb = b.getRGB(0, 0, b.getWidth, b.getHeight, null, 0, b.getWidth)
      assert(java.util.Arrays.equals(pa, pb),
        s"doc $id: readImage raster differs from ImageIO.read's")
    }
    // no claimant: both return null
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    assert(MultimodalOps.ImageCodec.readImage(junk) === null)
    assert(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(junk)) === null)
    // claimed-but-corrupt: PNG magic intact, stream truncated — both throw
    val truncated = MultimodalOps.ImageCodec.synthPng(7L, 8, 6).take(24)
    intercept[Exception] { MultimodalOps.ImageCodec.readImage(truncated) }
    intercept[Exception] {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(truncated))
    }
  }

  test("AudioCodec.decodeStats rejects undecodable payloads loudly") {
    val truncated = MultimodalOps.AudioCodec.synthWav(7L).take(8)
    intercept[Exception] {
      MultimodalOps.AudioCodec.decodeStats(truncated)
    }
  }

  test("routeWavDecodes quarantines corrupt payloads per row without failing the job") {
    import MultimodalOps.WavRow
    val rows = Seq(
      WavRow(1L, MultimodalOps.AudioCodec.synthWav(1L)),
      WavRow(97L, MultimodalOps.AudioCodec.synthWav(97L).take(8))).toDS()
    val routed = MultimodalOps.routeWavDecodes(rows).collect().sortBy(_.doc_id)
    assert(routed.map(r => (r.doc_id, r.status)).toSeq ===
      Seq((1L, "ok"), (97L, "quarantined")))
    assert(routed.head.n_frames === Some(MultimodalOps.AudioCodec.nFrames(1L).toLong))
    assert(routed.last.n_frames === None)
  }

  test("ImageCodec.decodeStats rejects undecodable payloads loudly") {
    val e = intercept[IllegalArgumentException] {
      MultimodalOps.ImageCodec.decodeStats("not a png".getBytes)
    }
    assert(e.getMessage.contains("not a decodable image"))
  }

  test("mm_decode computes from decoded pixels, distributed") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("mm_decode")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(w === id % 12 + 4)
      assert(h === id % 9 + 3)
      assert(r.getLong(3) === w * h)
    }
  }

  test("resizePngs samples the decoded raster at the thumbnail grid") {
    import spark.implicits._
    val png = MultimodalOps.ImageCodec.synthPng(7L, 9, 6)
    val out = MultimodalOps.resizePngs(Seq(MultimodalOps.PngRow(7L, png)).toDS())
      .collect().head
    assert((out.width, out.height) === (9L, 6L))
    var er = 0L; var eg = 0L; var eb = 0L
    for (ty <- 0 until MultimodalOps.ThumbH; tx <- 0 until MultimodalOps.ThumbW) {
      val (sx, sy) = (tx * 9 / MultimodalOps.ThumbW, ty * 6 / MultimodalOps.ThumbH)
      er += MultimodalOps.ImageCodec.pixel(7L, sx, sy, 0)
      eg += MultimodalOps.ImageCodec.pixel(7L, sx, sy, 1)
      eb += MultimodalOps.ImageCodec.pixel(7L, sx, sy, 2)
    }
    assert((out.t_sum_r, out.t_sum_g, out.t_sum_b) === (er, eg, eb))
  }

  test("routeDecodes quarantines corrupt payloads per row without failing the job") {
    import spark.implicits._
    val good = MultimodalOps.PngRow(1L, MultimodalOps.ImageCodec.synthPng(1L, 5, 4))
    val bad = MultimodalOps.PngRow(2L,
      MultimodalOps.ImageCodec.synthPng(2L, 5, 4).take(8)) // magic only
    val out = MultimodalOps.routeDecodes(Seq(good, bad).toDS())
      .collect().sortBy(_.doc_id)
    assert(out(0) === MultimodalOps.RoutedRow(1L, "ok", Some(20L)))
    assert(out(1) === MultimodalOps.RoutedRow(2L, "quarantined", None))
  }

  test("VideoCodec round-trips: sampled frames decode to the generating pixels") {
    val video = MultimodalOps.VideoCodec.synthVideo(9L, 6, 5)
    // doc 9: 9 % 6 + 2 = 5 frames; stride 2 samples 0, 2, 4
    val frames = MultimodalOps.VideoCodec.decodeSampledFrames(video)
    assert(frames.map(_._1) === Seq(0L, 2L, 4L))
    frames.foreach { case (fi, st) =>
      assert((st.width, st.height) === (6, 5))
      val key = MultimodalOps.VideoCodec.frameKey(9L, fi.toInt)
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until 5; x <- 0 until 6) {
        er += MultimodalOps.ImageCodec.pixel(key, x, y, 0)
        eg += MultimodalOps.ImageCodec.pixel(key, x, y, 1)
        eb += MultimodalOps.ImageCodec.pixel(key, x, y, 2)
      }
      assert((st.sumR, st.sumG, st.sumB) === (er, eg, eb),
        s"frame $fi decoded sums diverge from the generating formula")
    }
  }

  test("VideoCodec decode honors the container's table, not the writer's layout") {
    // hand-build a container whose table lists frames in REVERSED
    // payload order: frame index 0's bytes live LAST in the payload. A
    // decoder assuming the writer's sequential layout reads the wrong
    // frame; one seeking through the table gets each frame right.
    val f0 = MultimodalOps.ImageCodec.synthPng(100L, 4, 3)
    val f1 = MultimodalOps.ImageCodec.synthPng(200L, 4, 3)
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeBytes("GVID"); dos.writeInt(2)
    val base = (8 + 2 * 12).toLong
    dos.writeLong(base + f1.length); dos.writeInt(f0.length) // frame 0 AFTER frame 1
    dos.writeLong(base); dos.writeInt(f1.length)
    dos.write(f1); dos.write(f0); dos.flush()
    val frames = MultimodalOps.VideoCodec.decodeSampledFrames(bos.toByteArray, stride = 1)
    val s0 = MultimodalOps.ImageCodec.decodeStats(f0)
    val s1 = MultimodalOps.ImageCodec.decodeStats(f1)
    assert(frames === Seq((0L, s0), (1L, s1)),
      "frames must be sliced at the table's offsets, not sequentially")
  }

  test("routeVideoDecodes quarantines truncated containers and bad frames per row") {
    import spark.implicits._
    val good = MultimodalOps.VideoRow(1L, MultimodalOps.VideoCodec.synthVideo(1L, 5, 4))
    val truncated = MultimodalOps.VideoRow(2L,
      MultimodalOps.VideoCodec.synthVideo(2L, 5, 4).take(8)) // table gone
    // valid table, undecodable frame bytes: corrupt one sampled frame's
    // payload region (zero 16 bytes inside frame 0, past its PNG magic)
    val corrupt = {
      val v = MultimodalOps.VideoCodec.synthVideo(3L, 5, 4)
      val headerLen = 8 + MultimodalOps.VideoCodec.nVideoFrames(3L) * 12
      for (i <- headerLen + 16 until headerLen + 32) v(i) = 0
      MultimodalOps.VideoRow(3L, v)
    }
    val out = MultimodalOps.routeVideoDecodes(Seq(good, truncated, corrupt).toDS())
      .collect().sortBy(_.doc_id)
    assert(out(0) === MultimodalOps.VideoRoutedRow(1L, "ok", Some(3L))) // 1 % 6 + 2
    assert(out(1) === MultimodalOps.VideoRoutedRow(2L, "quarantined", None))
    assert(out(2) === MultimodalOps.VideoRoutedRow(3L, "quarantined", None))
  }
}
