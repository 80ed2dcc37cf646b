package graft.ops

import graft.{Cols, OracleSql, Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal-column plumbing: media payloads are opaque BINARY columns
  * with typed metadata. The container has no image/audio codecs, so the
  * decode step is a clearly-marked deterministic STUB
  * ([[StubCodec.decodeMeta]]); everything Spark-side — binary schema,
  * partition-parallel decode via mapPartitions over a typed Dataset,
  * frame addressing, stride sampling — is real and tested.
  *
  * Fixture media: each document's text bytes act as the payload (same
  * synthesis in the oracle SQL via encode()), framed in 16-byte chunks.
  */
object MultimodalOps {

  val FrameBytes = 16
  val SampleStride = 4

  /** A media row as a typed Dataset element. */
  final case class MediaRow(doc_id: Long, content: Array[Byte])

  /** Extracted per-frame record. */
  final case class Frame(doc_id: Long, frame_idx: Long, frame_off: Long, frame_len: Long)

  /** STUB codec: stands in for an image/audio decoder. Deterministic on
    * the payload bytes only — a real deployment swaps this object for a
    * JNI/library-backed implementation with the same signature.
    */
  object StubCodec {
    def decodeMeta(content: Array[Byte]): (Long, Long) = {
      // fake "width/height" derived from the payload digest
      val d = java.security.MessageDigest.getInstance("MD5").digest(content)
      val hex = d.map("%02x".format(_)).mkString
      val v = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      (v % 640 + 1, v % 480 + 1)
    }

    def frames(content: Array[Byte], stride: Int): Iterator[(Long, Long, Long)] = {
      val nFrames = (content.length + FrameBytes - 1) / FrameBytes
      Iterator.range(0, nFrames, stride).map { i =>
        val off = i.toLong * FrameBytes
        (i.toLong, off, math.min(FrameBytes.toLong, content.length - off))
      }
    }
  }

  /** documents.text -> BINARY payload column (the multimodal schema). */
  def pack(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))

  /** The sampled-frame relation (every SampleStride-th FrameBytes-sized
    * frame of each non-empty payload) — ONE definition with its SQL
    * twin, shared by `mm_frame_sample` (frames are the output) and
    * `mm_shard_manifest` (frames are the packing input) so the
    * sampling stride/size cannot drift between the sample and the
    * shard layout built over it.
    */
  private def sampledFrames(s: SparkSession, dir: String): DataFrame = {
    val nBytes = expr("octet_length(text)").cast(LongType)
    val nFrames = ceil(nBytes / lit(16.0)).cast(LongType)
    Tables.load(s, dir, "documents")
      // a zero-byte payload has no frames: the oracle's range(0,0,4)
      // yields no rows, but Spark's sequence(0,-1,4) THROWS — filter
      // empties on both sides so the engines agree on legal input
      .filter(nBytes > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0L), nFrames - 1, lit(4L))).as("frame_idx"),
        nBytes.as("n_bytes"))
  }

  private val sampledFramesSql =
    """SELECT doc_id,
      |  unnest(range(0, CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT), 4)) AS frame_idx,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |FROM documents
      |WHERE octet_length(encode(text)) > 0""".stripMargin

  /** Partition-parallel decode over a typed Dataset — the real plumbing
    * a Pandas-UDF / mapInPandas path would use, with the codec stubbed.
    */
  def decodeFrames(media: Dataset[MediaRow], stride: Int = SampleStride): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { row =>
      StubCodec.frames(row.content, stride).map { case (idx, off, len) =>
        Frame(row.doc_id, idx, off, len)
      }
    })
  }

  val queries: Seq[Q] = Seq(

    // Binary metadata extraction: payload size + stub-decoded dims +
    // frame accounting, all expression-level (md5 of the payload text —
    // same digest both engines).
    Q("mm_meta",
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  CAST(${OracleSql.hex60("text")} % 640 + 1 AS BIGINT) AS width,
         |  CAST(${OracleSql.hex60("text")} % 480 + 1 AS BIGINT) AS height,
         |  CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) AS n_frames,
         |  CAST(floor((CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) + 3) / 4.0) AS BIGINT) AS n_sampled
         |FROM documents""".stripMargin) { (s, dir) =>
      val nBytes = expr("octet_length(text)").cast(LongType)
      val nFrames = ceil(nBytes / lit(16.0)).cast(LongType)
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        nBytes.as("n_bytes"),
        (Cols.hex60(col("text")) % 640 + 1).cast(LongType).as("width"),
        (Cols.hex60(col("text")) % 480 + 1).cast(LongType).as("height"),
        nFrames.as("n_frames"),
        floor((nFrames + 3) / lit(4.0)).cast(LongType).as("n_sampled"))
    },

    // Feature extraction: the embed step of a multimodal pipeline with
    // the codec stubbed — an 8-dim deterministic feature vector derived
    // from the payload bytes (hash-per-dimension), plus its norm. The
    // vector is emitted as fixed-width scalar columns f0..f7 (not
    // array<double>) so downstream tabular consumers — and the
    // row-hashing verify harness — can sort/compare rows; the per-row
    // scan-stage shape is exactly what a real model-backed featurizer
    // produces.
    Q("mm_features", {
      val dims = 0 until 8
      val fSql = dims.map(d =>
        s"(('0x' || substr(md5(text || '|$d'), 1, 15))::BIGINT / 1152921504606846976.0)")
      val normSql = fSql.map(f => s"$f*$f").mkString("(0.0 + ", " + ", ")")
      s"""SELECT doc_id,
         |  ${fSql.zipWithIndex.map { case (f, d) => s"$f AS f$d" }.mkString(",\n   ")},
         |  $normSql AS fnorm
         |FROM documents""".stripMargin
    }) { (s, dir) =>
      val dims = 0 until 8
      val f = dims.map(d => Cols.unitHash(concat(col("text"), lit(s"|$d"))))
      val fnorm = f.foldLeft(lit(0.0))((acc, x) => acc + x * x)
      Tables.load(s, dir, "documents").select(
        col("doc_id") +:
          f.zipWithIndex.map { case (c, d) => c.as(s"f$d") } :+
          fnorm.as("fnorm"): _*)
    },

    // Inference micro-batching: the sampled frames assembled into
    // fixed-size batches of 32 for a model/decoder to consume (the
    // stage that feeds decodeFrames' partition-parallel codec slot).
    // Batching is per shard (doc_id % 8) so batch assembly is
    // partition-parallel at any corpus size — the same sharding
    // argument as text_seq_pack; within a shard, frames batch in
    // deterministic (doc_id, frame_idx) order. All-integer window
    // arithmetic — bit-identical cross-engine.
    Q("mm_batch_pack",
      """WITH f AS (
        |  SELECT doc_id,
        |    unnest(range(0, CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT), 4)) AS frame_idx
        |  FROM documents WHERE octet_length(encode(text)) > 0)
        |SELECT doc_id, frame_idx, shard,
        |  CAST(floor((rn - 1) / 32.0) AS BIGINT) AS batch_id,
        |  (rn - 1) % 32 AS batch_pos
        |FROM (
        |  SELECT doc_id, frame_idx, doc_id % 8 AS shard,
        |    row_number() OVER (PARTITION BY doc_id % 8
        |                       ORDER BY doc_id, frame_idx) AS rn
        |  FROM f) t""".stripMargin) { (s, dir) =>
      val nBytes = expr("octet_length(text)").cast(LongType)
      val nFrames = ceil(nBytes / lit(16.0)).cast(LongType)
      val f = Tables.load(s, dir, "documents")
        .filter(nBytes > 0)
        .select(col("doc_id"),
          explode(sequence(lit(0L), nFrames - 1, lit(4L))).as("frame_idx"),
          (col("doc_id") % 8).as("shard"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy(col("doc_id"), col("frame_idx"))
      f.withColumn("rn", row_number().over(w).cast(LongType))
        .select(col("doc_id"), col("frame_idx"), col("shard"),
          floor((col("rn") - 1) / lit(32.0)).cast(LongType).as("batch_id"),
          ((col("rn") - 1) % 32).as("batch_pos"))
    },

    // Frame sampling: every 4th 16-byte frame of each payload, exploded
    // to one row per sampled frame (the distributed shape a video
    // frame-sampler produces).
    Q("mm_frame_sample", sampledFramesSql) { (s, dir) =>
      sampledFrames(s, dir)
    },

    // Training-shard manifest: the sampled frames laid out into
    // fixed-budget shard files (4096 bytes) per packing stream
    // (doc_id % 8) — the manifest a webdataset/tar-shard writer
    // consumes. text_seq_pack's concat-and-chunk formula applied to
    // BYTES: each frame records the shard file its payload starts in
    // and the offset there; a frame's true byte length is
    // min(16, n_bytes - offset) (the tail frame is short). All-BIGINT
    // window arithmetic per shard stream — partition-parallel at any
    // corpus size, and the DuckDB window-sum HUGEINT is cast back to
    // BIGINT (the text_seq_pack lesson).
    Q("mm_shard_manifest",
      s"""WITH f AS (
        |  SELECT doc_id, doc_id % 8 AS shard, frame_idx, n_bytes
        |  FROM ($sampledFramesSql) sf),
        |b AS (
        |  SELECT doc_id, shard, frame_idx,
        |    least(16, n_bytes - frame_idx * 16) AS frame_bytes
        |  FROM f),
        |c AS (
        |  SELECT doc_id, shard, frame_idx, frame_bytes,
        |    CAST(sum(frame_bytes) OVER (PARTITION BY shard
        |           ORDER BY doc_id, frame_idx
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM b)
        |SELECT doc_id, shard, frame_idx, frame_bytes,
        |  CAST(floor((cum - frame_bytes) / 4096.0) AS BIGINT) AS shard_file,
        |  CAST((cum - frame_bytes) % 4096 AS BIGINT) AS file_off
        |FROM c""".stripMargin) { (s, dir) =>
      val f = sampledFrames(s, dir)
        .withColumn("shard", col("doc_id") % 8)
        .withColumn("frame_bytes",
          least(lit(16L), col("n_bytes") - col("frame_idx") * 16))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy(col("doc_id"), col("frame_idx"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      f.withColumn("cum", sum("frame_bytes").over(w))
        .select(col("doc_id"), col("shard"), col("frame_idx"), col("frame_bytes"),
          floor((col("cum") - col("frame_bytes")) / lit(4096.0))
            .cast(LongType).as("shard_file"),
          ((col("cum") - col("frame_bytes")) % 4096).as("file_off"))
    },
  )
}
