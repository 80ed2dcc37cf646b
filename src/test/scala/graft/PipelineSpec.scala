package graft

import graft.io.{JsonArraySource, ParquetSource}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** End-to-end tests of the reference pipeline's control flow
  * (SURVEY.md §2 O3/O16/O17/O18): JSON in, merge, unmatched report,
  * single-object CSV out, per-stage fail-fast routing, non-fatal
  * notifier failures.
  */
class PipelineSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val root = Files.createTempDirectory("graft-pipeline-spec").toString

  private def writeJson(name: String, content: String): String = {
    val p = Paths.get(root, name)
    Files.writeString(p, content)
    p.toString
  }

  private val primaryJson = writeJson("primary.json",
    """[
      |  {"id": 1, "qty": 10.5, "note": "from-s3"},
      |  {"id": 2, "note": "no-qty"},
      |  {"id": 5, "qty": 50.0, "note": "unmatched-primary"}
      |]""".stripMargin)

  private val secondaryPath = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", DoubleType),
      StructField("region", StringType)))
    val df = spark.createDataFrame(Seq(
      Row(1L, 111.0, "east"), Row(2L, 222.0, "west"),
      Row(7L, 777.0, "north"), Row(8L, 888.0, "south")).asJava, schema)
    val p = s"$root/secondary.parquet"
    df.write.mode("overwrite").parquet(p)
    p
  }

  private def spec(destFile: String) = Pipeline.PipelineSpec(
    primary = JsonArraySource(primaryJson),
    secondary = ParquetSource(secondaryPath),
    destDir = s"$root/out",
    destFile = destFile)

  test("happy path: merge, exact-name single CSV, success + unmatched notifications") {
    val notifier = new RecordingNotifier
    val result = Pipeline.run(spark, spec("merged.csv"), notifier)
    assert(result.isRight)
    val r = result.toOption.get
    assert(r.mergedRows === 3)
    assert(r.unmatchedRows === 2) // ids 7, 8
    val csv = Paths.get(s"$root/out/merged.csv")
    assert(Files.exists(csv), "CSV must exist under the exact requested key")
    val lines = Files.readAllLines(csv).asScala
    assert(lines.size === 4) // header + 3 rows
    assert(lines.head.split(",").contains("id"))
    assert(notifier.messages.exists(_.startsWith("Success")))
    val unmatched = notifier.messages.find(_.startsWith("Unmatched"))
    assert(unmatched.exists(m => m.contains("2") && m.contains("7") && m.contains("8")))
  }

  test("merged values follow S3-wins precedence through the CSV") {
    val notifier = new RecordingNotifier
    Pipeline.run(spark, spec("prec.csv"), notifier)
    val out = spark.read.option("header", value = true)
      .csv(s"$root/out/prec.csv").collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("qty")).toMap
    assert(out("1") === "10.5")   // primary qty wins
    assert(out("2") === "222.0")  // missing primary qty filled from secondary
    assert(out("5") === "50.0")   // unmatched primary keeps its value
  }

  test("fail-fast: unreadable primary -> Left(read-primary) + error notification") {
    val notifier = new RecordingNotifier
    val bad = spec("x.csv").copy(primary = JsonArraySource(s"$root/nope.json"))
    val result = Pipeline.run(spark, bad, notifier)
    assert(result.left.toOption.map(_.stage).contains("read-primary"))
    assert(notifier.messages.exists(_.startsWith("Error: failed to read JSON")))
  }

  test("fail-fast: missing key column -> Left(validate-key) + error notification") {
    val noId = writeJson("noid.json", """[{"name": "x"}]""")
    val notifier = new RecordingNotifier
    val result = Pipeline.run(spark, spec("y.csv").copy(primary = JsonArraySource(noId)), notifier)
    assert(result.left.toOption.map(_.stage).contains("validate-key"))
    assert(notifier.messages.exists(_.contains("'id' column not found")))
  }

  test("a failing notifier is non-fatal (reference gule_test_job.py:195-199)") {
    val result = Pipeline.run(spark, spec("nofail.csv"), new FailingNotifier)
    assert(result.isRight)
    assert(Files.exists(Paths.get(s"$root/out/nofail.csv")))
  }

  test("quoted embedded newlines survive the CSV round trip and don't inflate counts") {
    // regression: the count stage used to re-read without multiLine,
    // splitting a quoted newline into an extra phantom record
    val nlJson = writeJson("newline.json",
      """[
        |  {"id": 1, "qty": 1.0, "note": "line one\nline two"},
        |  {"id": 2, "qty": 2.0, "note": "plain"}
        |]""".stripMargin)
    val notifier = new RecordingNotifier
    val result = Pipeline.run(spark,
      spec("newline.csv").copy(primary = JsonArraySource(nlJson)), notifier)
    assert(result.isRight)
    assert(result.toOption.get.mergedRows === 2,
      s"embedded newline split a record: ${result.toOption.get}")
    val back = spark.read.option("header", value = true).option("multiLine", value = true)
      .csv(s"$root/out/newline.csv").collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("note")).toMap
    assert(back("1") === "line one\nline two")
  }
}
