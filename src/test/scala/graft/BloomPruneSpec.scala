package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the mechanism that, at 100 TB,
  * pre-filters the FACT side's shuffle with a bloom filter built from a
  * selectively-filtered dimension, so most fact rows die in the scan
  * stage instead of crossing the wire. This spec pins the engine
  * contract: with the feature on (and size thresholds lowered to fire
  * on fixture-scale inputs), Catalyst injects a BloomFilterMightContain
  * predicate on the fact side of a selective shuffle join.
  */
class BloomPruneSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("selective dim filter injects a bloom might_contain on the fact side") {
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: bloom pruning targets exactly the case
      // where the dim is too big to broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
      (1L to 2000L).map(i => (i, s"p$i", i % 7)).toDF("p_id", "p_name", "p_cat")
        .write.mode("overwrite").parquet(s"$dir/dim")
      (1L to 20000L).map(i => (i % 2000 + 1, i)).toDF("f_pid", "f_val")
        .write.mode("overwrite").parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("p_cat") === 3)
      val fact = spark.read.parquet(s"$dir/fact")
      val joined = fact.join(dim, col("f_pid") === col("p_id"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("BloomFilterMightContain"),
        s"expected a runtime bloom filter in:\n$optimized")
      // and the result is still correct under the injected filter
      assert(joined.count() ==
        fact.join(broadcast(spark.read.parquet(s"$dir/dim")
          .filter(col("p_cat") === 3)), col("f_pid") === col("p_id")).count())
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
