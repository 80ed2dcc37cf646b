package graft

import graft.io.ParquetSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Continuous ingestion end-to-end: primary JSON-lines files arrive in
  * two waves; each Pipeline.runStream invocation resumes from the
  * checkpoint and ingests ONLY the files not yet processed — the
  * incremental property the batch reference fundamentally lacks.
  */
class StreamingPipelineSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val root = Files.createTempDirectory("graft-stream-pipe").toString

  private val pSchema = StructType(Seq(
    StructField("id", LongType), StructField("qty", DoubleType),
    StructField("batch", StringType)))

  test("checkpointed streaming merge ingests each arriving file exactly once") {
    Files.createDirectories(Paths.get(s"$root/in"))
    val sSchema = StructType(Seq(
      StructField("id", LongType), StructField("qty", DoubleType),
      StructField("region", StringType)))
    spark.createDataFrame(Seq(
      Row(1L, 100.0, "east"), Row(2L, 200.0, "west")).asJava, sSchema)
      .write.mode("overwrite").parquet(s"$root/secondary")

    val spec = Pipeline.StreamingSpec(
      primaryDir = s"$root/in",
      primarySchema = pSchema,
      secondary = ParquetSource(s"$root/secondary"),
      outputDir = s"$root/out",
      checkpointDir = s"$root/ckpt")

    def arrive(name: String, lines: String*): Unit =
      Files.writeString(Paths.get(s"$root/in/$name"), lines.mkString("\n"))

    def ingest(): Unit = {
      val q = Pipeline.runStream(spark, spec)
      assert(q.awaitTermination(120000), "streaming ingest timed out")
    }

    // wave 1
    arrive("w1.json",
      """{"id": 1, "qty": 10.0, "batch": "w1"}""",
      """{"id": 2, "batch": "w1"}""")
    ingest()
    val after1 = spark.read.parquet(s"$root/out")
    assert(after1.count() === 2)
    assert(after1.filter(org.apache.spark.sql.functions.col("id") === 2)
      .head().getDouble(1) === 200.0) // gap filled from secondary

    // wave 2: only the NEW file is processed on resume
    arrive("w2.json", """{"id": 1, "qty": 11.0, "batch": "w2"}""")
    ingest()
    val after2 = spark.read.parquet(s"$root/out")
    assert(after2.count() === 3, "resume must ingest only the new file, once")
    assert(after2.filter(org.apache.spark.sql.functions.col("batch") === "w1").count() === 2)
    assert(after2.filter(org.apache.spark.sql.functions.col("batch") === "w2").count() === 1)

    // wave 3: re-run with NO new files -> nothing re-ingested
    ingest()
    assert(spark.read.parquet(s"$root/out").count() === 3,
      "idempotent resume re-ingested already-processed files")
  }
}
