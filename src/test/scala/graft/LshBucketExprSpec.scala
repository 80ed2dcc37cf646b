package graft

import graft.functions.VectorFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen LshBucketExpr must agree bucket-for-bucket with
  * the interpreted higher-order-function formulation on every fixture
  * vector — same planes, same IEEE operation order.
  */
class LshBucketExprSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("native expression == HOF formulation on all fixture embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("emb"))
    val both = emb.select(
      col("vec_id"),
      VectorFns.lshBucket(col("emb")).as("native"),
      VectorFns.lshBucketHof(col("emb")).as("hof"))
    val mismatches = both.filter(col("native") =!= col("hof")).count()
    assert(mismatches === 0)
    // sanity: buckets spread across the 16-bit space, not constant
    assert(both.select("native").distinct().count() > 1)
  }

  test("the expression participates in whole-stage codegen") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(VectorFns.lshBucket(VectorFns.toDouble(col("embedding"))).as("b"))
    // in executedPlan.toString a whole-stage-codegen member is starred:
    // "*(1) Project [graft_lsh_bucket(...)]"
    val plan = emb.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_lsh_bucket"), s"projection not codegen'd:\n$plan")
  }

  test("null or too-short embedding yields null bucket (oracle out-of-range semantics)") {
    import spark.implicits._
    val full = (1 to VectorFns.Dim).map(_.toDouble)
    val df = Seq(Some(Seq(1.0, -2.0)), None, Some(full)).toDF("emb")
    val out = df.select(VectorFns.lshBucket(col("emb")).as("b")).collect()
    // short vector AND null input -> null; full-width vector -> a bucket
    assert(out.count(_.isNullAt(0)) === 2)
    assert(out.count(!_.isNullAt(0)) === 1)
  }

  test("too-short arrays yield null dot (oracle out-of-range semantics)") {
    import spark.implicits._
    val full = (1 to VectorFns.Dim).map(_.toDouble)
    val df = Seq((Seq(1.0, 2.0), full), (full, full)).toDF("a", "b")
    val out = df.select(VectorFns.dot(col("a"), col("b")).as("d")).collect()
    assert(out.count(_.isNullAt(0)) === 1)
    assert(out.count(!_.isNullAt(0)) === 1)
  }
}
