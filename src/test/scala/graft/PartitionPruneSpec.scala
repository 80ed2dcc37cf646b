package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins that q_partition_prune's read-back actually PRUNES: the
  * `lang = 'en'` predicate must be satisfied from partition directory
  * names (PartitionFilters on the scan), not from row-level data
  * filters over all files — at 100 TB the difference is reading one
  * language vs reading the corpus. The oracle compare proves the
  * pruned slice's content; this proves the mechanism.
  */
class PartitionPruneSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  test("lang predicate lands in PartitionFilters, not data filters") {
    val df = SparkEntry.queries("q_partition_prune")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    // the scan must carry a non-empty PartitionFilters entry on lang
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(pf.exists(f => f.contains("lang") && f.trim.nonEmpty),
      s"no lang PartitionFilters in scan:\n$plan")
    // and lang must NOT appear as a pushed row-level filter
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(pushed.forall(!_.contains("lang")),
      s"lang leaked into PushedFilters (row-level) instead of pruning:\n$plan")
  }

  test("partitioned round trip preserves the pruned slice exactly") {
    val got = SparkEntry.queries("q_partition_prune")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    spark.catalog.clearCache()
    val want = Tables.load(spark, dir, "documents")
      .filter(col("lang") === "en")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("chars_total"),
        sum(Cols.hex60(col("text")) % lit(1000003L))
          .cast(org.apache.spark.sql.types.LongType).as("text_digest"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.nonEmpty && (got sameElements want))
  }
}
