package graft

import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** q_skew_join's contract: under the production dials (no broadcast,
  * thresholds scaled to data), AQE detects the hot key-0 partition at
  * RUNTIME and splits it — the executed plan carries an
  * isSkewJoin sort-merge join whose skewed side reads more (smaller)
  * partitions than the static shuffle produced — while the result
  * stays row-identical to the undialed plan (skew surgery is physical,
  * never semantic).
  */
class SkewJoinSpec extends AnyFunSuite with SparkSessionTestWrapper {

  // sf0.01: ~60k lineitem rows, 3/4 of them on key 0 — enough bytes to
  // cross the fixture-scaled skew dials (8k skewedPartitionThresholdInBytes,
  // 4k advisoryPartitionSizeInBytes; see RelationalOps.skewDials)
  private val dir = "/root/testdata/sf0.01"

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: QueryStageExec => p +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  test("AQE splits the hot partition: isSkewJoin plan, identical result") {
    val baseline = ops.RelationalOps.skewJoin(spark, dir).collect()
      .map(_.toString).sorted

    val saved = ops.RelationalOps.skewDials
      .map(k => k -> spark.conf.getOption(k)).toMap
    ops.RelationalOps.skewDials.zip(ops.RelationalOps.skewDialValues)
      .foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = ops.RelationalOps.skewJoin(spark, dir)
      val got = df.collect().map(_.toString).sorted
      assert(got === baseline, "skew surgery changed the result")

      val nodes = flatten(df.queryExecution.executedPlan)
      val smjs = nodes.collect { case j: SortMergeJoinExec => j }
      assert(smjs.exists(_.isSkewJoin),
        s"expected an isSkewJoin sort-merge join, got: ${smjs.mkString("; ")}")
      // the skewed side's AQE shuffle read must expand the hot
      // partition into multiple sub-reads: more output partitions than
      // the static shuffle count it reads from
      val reads = nodes.collect { case r: AQEShuffleReadExec => r }
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      assert(reads.exists(_.partitionSpecs.length > parts),
        s"no shuffle read was split past the static $parts partitions: " +
          reads.map(_.partitionSpecs.length).mkString(","))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("sf10: the split triggers UNFORCED under production-default dials") {
    // The fixture-scale case above needs forceOptimizeSkewedJoin (at
    // tiny sizes AQE's cost check vetoes the split for the extra
    // exchange). This case closes the "would AQE actually save you in
    // production" question: at sf10's genuine byte skew (~45M rows of
    // 60M on key 0, an incompressible md5 payload), the hot partition
    // crosses the STOCK thresholds (256m skewedPartitionThresholdInBytes,
    // 5x median, 64m advisory) and the split must fire with the force
    // dial OFF. target/sf10 is generated (scripts/gen_sf1.py chained)
    // and gitignored — cancel, don't fail, when it is absent.
    val sf10 = "target/sf10"
    assume(new java.io.File(s"$sf10/lineitem.parquet").exists(),
      "sf10 fixtures not generated in this checkout")

    val dials = ops.RelationalOps.skewDials
    val unforced = Seq("-1", "-1", "5.0", "256m", "64m", "false")
    val saved = dials.map(k => k -> spark.conf.getOption(k)).toMap
    dials.zip(unforced).foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = ops.RelationalOps.skewJoin(spark, sf10)
      val rows = df.collect()
      assert(rows.length === 10, "rollup must cover all 10 buckets")

      val nodes = flatten(df.queryExecution.executedPlan)
      val smjs = nodes.collect { case j: SortMergeJoinExec => j }
      assert(smjs.exists(_.isSkewJoin),
        s"unforced split did not trigger at sf10: ${smjs.mkString("; ")}")
      val reads = nodes.collect { case r: AQEShuffleReadExec => r }
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      assert(reads.exists(_.partitionSpecs.length > parts),
        s"no shuffle read was split past the static $parts partitions: " +
          reads.map(_.partitionSpecs.length).mkString(","))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
