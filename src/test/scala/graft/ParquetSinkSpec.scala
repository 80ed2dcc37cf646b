package graft

import graft.io.ParquetSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Partitioned warehouse writes: layout, dynamic overwrite semantics,
  * and partition pruning on read-back.
  */
class ParquetSinkSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-pq-sink").toString

  test("writes dt=... partition directories and reads back partitioned") {
    val dir = tmpDir()
    val df = Seq(
      ("2026-08-10", 1L, "a"), ("2026-08-10", 2L, "b"), ("2026-08-11", 3L, "c")
    ).toDF("dt", "id", "v")
    ParquetSink.writePartitioned(df, dir, Seq("dt"))
    val dts = Files.list(Paths.get(dir)).iterator()
    val dirs = new scala.collection.mutable.ArrayBuffer[String]
    while (dts.hasNext) {
      val p = dts.next().getFileName.toString
      if (!p.startsWith("_")) dirs += p
    }
    assert(dirs.sorted == Seq("dt=2026-08-10", "dt=2026-08-11"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    // partition pruning: the dt filter must reduce scanned files, which
    // surfaces as a PartitionFilters entry in the formatted plan
    val plan = back.filter(col("dt") === "2026-08-10")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("dt"))
  }

  test("dynamic overwrite replaces only the partitions in the batch") {
    val dir = tmpDir()
    ParquetSink.writePartitioned(
      Seq(("2026-08-10", 1L), ("2026-08-11", 2L)).toDF("dt", "id"), dir, Seq("dt"))
    // second batch touches only 2026-08-11 (new value) and 2026-08-12
    ParquetSink.writePartitioned(
      Seq(("2026-08-11", 99L), ("2026-08-12", 3L)).toDF("dt", "id"), dir, Seq("dt"))
    val back = spark.read.parquet(dir)
      .select("dt", "id").as[(String, Long)].collect().toSet
    // 08-10 survives untouched, 08-11 fully replaced, 08-12 added
    assert(back == Set(("2026-08-10", 1L), ("2026-08-11", 99L), ("2026-08-12", 3L)))
  }

  test("maxRecordsPerFile splits an oversized partition into bounded files") {
    val dir = tmpDir()
    val df = (1 to 100).map(i => ("2026-08-10", i.toLong)).toDF("dt", "id")
    ParquetSink.writePartitioned(df.repartition(1), dir, Seq("dt"), maxRecordsPerFile = 30L)
    val files = Files.list(Paths.get(dir, "dt=2026-08-10")).iterator()
    var n = 0
    while (files.hasNext) {
      if (files.next().getFileName.toString.endsWith(".parquet")) n += 1
    }
    // 100 rows / 30 per file -> 4 files from ONE task
    assert(n == 4)
  }

  test("dynamic partition pruning fires on a dim-filtered join against the partitioned fact") {
    // the 100 TB join pattern: fact partitioned on the join key, dim
    // filtered at runtime — Spark must inject a dynamic pruning
    // subquery into the fact scan so only the dim's surviving
    // partitions are read (static PartitionFilters can't see through
    // the join). The dim must be FILE-backed: a local relation's
    // filter constant-folds away (ConvertToLocalRelation) before the
    // pruning rule looks for a selective predicate, silently
    // disabling DPP — the same trap a notebook-built dim hits in
    // production.
    val dir = tmpDir()
    val dimDir = tmpDir()
    val fact = (1 to 200).map(i => (s"t${i % 4}", i.toLong)).toDF("etype", "id")
    ParquetSink.writePartitioned(fact, dir, Seq("etype"))
    Seq(("t1", "keep"), ("t2", "drop")).toDF("d_etype", "label")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = spark.read.parquet(dir)
      .join(broadcast(dim.filter(col("label") === "keep")),
        col("etype") === col("d_etype"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning subquery in the fact scan:\n$plan")
    assert(joined.count() === 50)
  }
}
