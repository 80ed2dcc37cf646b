package graft

import graft.ops.{DedupOps, TextOps}
import graft.streaming.StatefulOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** One input document of the streaming curation flow. */
final case class CurDoc(doc_id: Long, lang: String, text: String)

/** The streaming face of `corpus_curate`: content-digest keep-first
  * dedup (StatefulOps.keepFirstByKey) composed with the SAME quality
  * filter and split assignment the batch query uses (TextOps.qualityCol
  * / QualityMin / splitCol — single-sourced, so the two paths cannot
  * drift).
  *
  * Ingestion scenario: backfill (the original corpus) in trigger 1,
  * incremental arrivals (the planted exact copies, ids +20M) in
  * trigger 2. Arrival-order keep-first then equals the batch pipeline's
  * min-doc_id keeper exactly, so the streaming output must match the
  * oracle-checked corpus_curate row set bit for bit.
  */
class StreamingCurateSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  test("streaming dedup+quality+split == batch corpus_curate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    val originals = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[CurDoc].collect().toSeq
    val copies = originals.filter(_.doc_id % 7 == 0)
      .map(d => d.copy(doc_id = d.doc_id + 20000000L))

    val ms = MemoryStream[CurDoc]
    val deduped = StatefulOps.keepFirstByKey(
      ms.toDS(),
      (d: CurDoc) => java.security.MessageDigest.getInstance("MD5")
        .digest(d.text.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val curated = deduped.toDF()
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
        TextOps.qualityCol(col("text")).as("quality"))
      .filter(col("quality") >= TextOps.QualityMin)
      .withColumn("split", TextOps.splitCol(col("doc_id")))

    val q = curated.writeStream.format("memory").queryName("stream_curate")
      .outputMode("append").start()
    try {
      ms.addData(originals) // trigger 1: backfill
      q.processAllAvailable()
      ms.addData(copies) // trigger 2: incremental dup arrivals
      q.processAllAvailable()

      val got = spark.table("stream_curate")
        .collect().map(_.toString).sorted
      val want = SparkEntry.queries("corpus_curate")(spark, dir)
        .select("doc_id", "lang", "n_tokens", "quality", "split")
        .collect().map(_.toString).sorted
      spark.catalog.clearCache()
      assert(got.nonEmpty)
      assert(got === want)
      // the dedup genuinely dropped the copy wave: no +20M id survived
      assert(!spark.table("stream_curate").collect()
        .exists(_.getAs[Long]("doc_id") >= 20000000L))
    } finally q.stop()
  }

  test("keepFirstByKey drops intra- and inter-trigger duplicates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[CurDoc]
    val q = StatefulOps.keepFirstByKey(ms.toDS(), (d: CurDoc) => d.text)
      .writeStream.format("memory").queryName("keep_first")
      .outputMode("append").start()
    try {
      ms.addData(Seq(CurDoc(1, "en", "same"), CurDoc(2, "en", "other")))
      q.processAllAvailable()
      ms.addData(Seq(CurDoc(3, "en", "same"), CurDoc(4, "en", "third")))
      q.processAllAvailable()
      val got = spark.table("keep_first").as[CurDoc].collect().sortBy(_.doc_id)
      assert(got.map(_.doc_id).toSeq === Seq(1L, 2L, 4L))
    } finally q.stop()
  }
}
