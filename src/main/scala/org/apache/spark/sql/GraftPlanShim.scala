package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge between graft's custom logical plans and the public Dataset
  * API — the whole-operator sibling of [[GraftColumnShim]]. Spark 4
  * keeps `Dataset.ofRows` (logical plan → DataFrame) `private[sql]`;
  * this shim re-exports exactly the two conversions the
  * [[graft.plans]] operators need: wrap a custom LogicalPlan as a
  * DataFrame, and read a DataFrame's analyzed plan to compose it into
  * one. Same technique and same footprint discipline as
  * GraftColumnShim: nothing else internal is touched.
  */
object GraftPlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
