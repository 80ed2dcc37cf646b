package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = pre-shuffling at write time: tables bucketed on the join
  * key by the same bucket count join WITHOUT an exchange on either side
  * — the technique that turns a recurring big-big join from
  * shuffle-per-query into shuffle-once-at-ingest. Proven here on the
  * actual executed plan, not asserted from folklore.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("join of co-bucketed tables plans no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS g_orders_bkt")
    spark.sql("DROP TABLE IF EXISTS g_customer_bkt")
    Tables.load(spark, dir, "orders")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("g_orders_bkt")
    Tables.load(spark, dir, "customer")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("g_customer_bkt")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("g_orders_bkt")
        .join(spark.table("g_customer_bkt"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      val joinSection = plan.substring(plan.indexOf("Join"))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-class join:\n$plan")
      // the join's inputs must come straight from the bucketed scans —
      // no Exchange between the join and the file scans
      val joinToScans = joinSection.take(
        joinSection.indexOf("FileScan") match { case -1 => joinSection.length; case i => i })
      assert(!joinToScans.contains("Exchange hashpartitioning"),
        s"join inputs were re-shuffled despite bucketing:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), s"scan not bucket-aware:\n$plan")
      // and the answer matches the plain (shuffled) join
      val expected = Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(_.toString).sorted
      assert(j.collect().map(_.toString).sorted === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS g_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS g_customer_bkt")
    }
  }
}
