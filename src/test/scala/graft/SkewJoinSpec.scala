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
}
