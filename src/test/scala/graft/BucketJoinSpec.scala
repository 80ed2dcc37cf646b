package graft

import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_bucket_join's contract has two halves: bucketing is pure LAYOUT
  * (row-for-row identical to the plain join over the raw fixtures),
  * and the layout buys a ZERO-exchange plan (join and aggregation both
  * consume the bucket partitioning in place). Both are pinned here,
  * plus the fresh-session path: a catalog that has never seen the
  * tables must re-register DDL over the existing bucket files, not
  * rewrite them.
  */
class BucketJoinSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  // QueryStageExec nodes are leaves to TreeNode.collect — descend into
  // their wrapped plans explicitly so a shuffle hidden inside a stage
  // (ShuffleQueryStageExec wraps the exchange) can't dodge the gate
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  private def planNodes(): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val df = SparkEntry.queries("q_bucket_join")(spark, dir)
    df.collect() // materialize so AQE finalizes the executed plan
    flatten(df.queryExecution.executedPlan)
  }

  test("q_bucket_join plans with zero exchanges and a sort-merge join") {
    val nodes = planNodes()
    val exchanges = nodes.collect { case e: ShuffleExchangeLike => e }
    assert(exchanges.isEmpty,
      s"bucketed join must not shuffle, found: ${exchanges.mkString("; ")}")
    assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
      "bucketed join must plan as a sort-merge join over the bucket scans")
  }

  test("bucketed result is row-identical to the plain join over raw fixtures") {
    val bucketed = SparkEntry.queries("q_bucket_join")(spark, dir)
    val plain = Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "orders"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey")
      .agg(max(col("c_mktsegment")).as("segment"),
        count(lit(1)).as("n_orders"),
        Cols.dsum(col("o_totalprice")).as("total_spent"))
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty,
      "bucketing changed the result set")
  }

  test("bucket pruning: an equality filter on the bucket column reads 1 of 8 buckets") {
    // the flip side of the co-located join: the same layout makes
    // point lookups skip 7/8 of the data before any row is read —
    // Spark prunes bucket FILES from the scan when the filter is an
    // equality on the bucket column
    SparkEntry.queries("q_bucket_join")(spark, dir).collect() // ensure staged+registered
    val t = spark.catalog.listTables().collect()
      .map(_.name).find(_.matches("b_orders_.*sf0_001")).get
    // DisableUnnecessaryBucketedScan reasons only about partitioning
    // requirements (none here — no join/agg), not about pruning, and
    // would demote the scan to non-bucketed; hold it off so the
    // pruning path itself is what's pinned
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val plan = spark.table(t).filter(col("o_custkey") === 42L)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected a pruned bucket scan, plan:\n$plan")
    } finally spark.conf.set(key, saved)
  }

  test("a fresh catalog re-registers DDL over the staged files (no rewrite)") {
    // force the fresh-session path: staged files exist, catalog does not
    SparkEntry.queries("q_bucket_join")(spark, dir).collect()
    val tables = spark.catalog.listTables().collect()
      .map(_.name).filter(_.matches("b_(orders|customer)_.*sf0_001"))
    assert(tables.length === 2, s"expected the two staged tables, got ${tables.toSeq}")
    val mtimes = tables.map { t =>
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $t").collect()
        .find(_.getString(0) == "Location").get.getString(1)
      val f = new java.io.File(new java.net.URI(loc))
      t -> f.listFiles().filter(_.getName.endsWith(".parquet")).map(_.lastModified).sorted.toSeq
    }.toMap
    tables.foreach(t => spark.sql(s"DROP TABLE $t"))
    val rows = SparkEntry.queries("q_bucket_join")(spark, dir).count()
    assert(rows > 0)
    mtimes.foreach { case (t, before) =>
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $t").collect()
        .find(_.getString(0) == "Location").get.getString(1)
      val f = new java.io.File(new java.net.URI(loc))
      val after = f.listFiles().filter(_.getName.endsWith(".parquet")).map(_.lastModified).sorted.toSeq
      assert(after === before, s"$t bucket files were rewritten by re-registration")
    }
  }
}
