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
