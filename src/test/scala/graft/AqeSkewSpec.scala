package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins that Adaptive Query Execution's runtime skew-join splitting —
  * the engine's recommended path for skewed join keys at production
  * scale (alongside the explicit salting pattern q_skew_salted_agg
  * demonstrates) — actually engages on this build of Spark: a join
  * whose left side funnels most rows into one key must come out of
  * AQE with the skewed partition split (skew=true on the join node),
  * and the result must be exactly the unskewed-plan answer. Thresholds
  * are lowered to make the fixture-sized partition register as skewed;
  * at 100 TB the defaults fire on real skew unaided.
  */
class AqeSkewSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("Verify/Bench sessions fail fast if AQE or skew-join splitting is off") {
    // the default session satisfies the invariant (Spark 4 defaults)
    Sessions.requireAqe(spark)
    // an explicit override must be caught at startup, not discovered as
    // a silently different plan shape across the whole registry
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try {
      val e = intercept[IllegalArgumentException] { Sessions.requireAqe(spark) }
      assert(e.getMessage.contains("skewJoin"))
    } finally spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
    Sessions.requireAqe(spark) // restored
  }

  test("AQE splits the skewed partition of a sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      // keep AQE from first coalescing the tiny partitions into one
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: 60k rows, 50k of them on key 0 — one partition carries
      // ~50x the bytes of its peers; right: uniform 1k keys
      // +1 keeps the uniform keys off key 0 (ids 50000.. would fold
      // back onto it through the modulo); key 1000 has no right match
      // and drops out of the inner join
      // payload = per-row md5 hex: shuffle blocks are lz4-compressed,
      // and 50k copies of one bare long deflate to under any realistic
      // threshold — incompressible payload makes the skewed partition's
      // BYTES proportional to its rows, as real wide rows are
      val left = spark.range(0, 60000).select(
        when(col("id") < 50000, 0L).otherwise(col("id") % 1000 + 1).as("k"),
        md5(col("id").cast("string")).as("payload"))
      val right = spark.range(0, 1000).select(
        col("id").as("k"), (col("id") * 2).as("w"))
      // consume with a GLOBAL aggregate: a groupBy on the join key
      // would need the join's output partitioning, and AQE declines to
      // split skew when the split forces an extra downstream shuffle —
      // precisely the case the rule documents. A global agg has no
      // required distribution, so the split is free.
      // the payload must be CONSUMED or column pruning strips it before
      // the shuffle and the skewed partition deflates below threshold
      val j = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("w")).as("ws"),
          sum(length(col("payload"))).as("pl"))
      val row = j.collect().head
      val plan = j.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed partition for splitting:\n$plan")
      // exactness under the split: 50k key-0 matches + 10 per uniform
      // key; each joined row carries w = 2k
      assert(row.getLong(0) === 50000L + 999L * 10L)
      // sum over k=1..999 of 10 rows * w=2k = 20 * 999*1000/2
      assert(row.getLong(1) === 20L * 999L * 1000L / 2L)
      // every joined row carries its 32-char md5 payload exactly once
      assert(row.getLong(2) === (50000L + 999L * 10L) * 32L)

    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
