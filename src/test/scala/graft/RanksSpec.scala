package graft

import graft.ops.Ranks
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase global rank must agree EXACTLY with the
  * single-partition window forms it replaces — same rank for every
  * row, same ntile bucket under SQL-standard remainder semantics —
  * on real data with duplicate sort keys (tie-break column makes the
  * order total, as the window forms also require).
  */
class RanksSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("withGlobalRowNumber == row_number() over a global order") {
    val cust = Tables.load(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("freq"), Cols.dsum(col("o_totalprice")).as("spend"))
    val (ranked, total) =
      Ranks.withGlobalRowNumber(cust, "rn", col("spend").desc, col("o_custkey"))
    val w = Window.orderBy(col("spend").desc, col("o_custkey"))
    val want = cust.withColumn("rn", row_number().over(w).cast("long"))
      .select("o_custkey", "rn").as[(Long, Long)].collect().toMap
    val got = ranked.select("o_custkey", "rn").as[(Long, Long)].collect().toMap
    assert(total === want.size.toLong)
    assert(got === want)
    // ranks are a permutation of 1..n (no gap, no dup from the offset math)
    assert(got.values.toSeq.sorted === (1L to total).toSeq)
    ranked.unpersist()
  }

  test("withGlobalRowNumber is exact with many duplicate sort keys") {
    // freq has heavy ties — the custkey tie-break must keep the rank
    // assignment identical to the window's
    val cust = Tables.load(spark, dir, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("freq"))
    val (ranked, _) =
      Ranks.withGlobalRowNumber(cust, "rn", col("freq").desc, col("o_custkey"))
    val w = Window.orderBy(col("freq").desc, col("o_custkey"))
    val want = cust.withColumn("rn", row_number().over(w).cast("long"))
      .select("o_custkey", "rn").as[(Long, Long)].collect().toMap
    val got = ranked.select("o_custkey", "rn").as[(Long, Long)].collect().toMap
    assert(got === want)
    ranked.unpersist()
  }

  test("ntileFromRank == ntile(k) for every k that exercises the remainder") {
    val cust = Tables.load(spark, dir, "orders")
      .groupBy("o_custkey").agg(Cols.dsum(col("o_totalprice")).as("spend"))
    val (ranked, n) =
      Ranks.withGlobalRowNumber(cust, "rn", col("spend").desc, col("o_custkey"))
    val w = Window.orderBy(col("spend").desc, col("o_custkey"))
    Seq(2, 3, 5, 7).foreach { k =>
      val want = cust.withColumn("t", ntile(k).over(w).cast("long"))
        .select("o_custkey", "t").as[(Long, Long)].collect().toMap
      val got = ranked
        .withColumn("t", Ranks.ntileFromRank("rn", n, k).cast("long"))
        .select("o_custkey", "t").as[(Long, Long)].collect().toMap
      withClue(s"k=$k:") { assert(got === want) }
    }
    ranked.unpersist()
  }

  test("ntileFromRank when n < k puts one row per leading tile") {
    val tiny = Seq((1L, 30.0), (2L, 20.0), (3L, 10.0)).toDF("id", "v")
    val (ranked, n) = Ranks.withGlobalRowNumber(tiny, "rn", col("v").desc, col("id"))
    assert(n === 3L)
    val got = ranked.withColumn("t", Ranks.ntileFromRank("rn", n, 5))
      .select("id", "t").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    ranked.unpersist()
  }

  test("withGlobalRowNumbers == three window row_number columns, one cache entry") {
    val cust = Tables.load(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("freq"), Cols.dsum(col("o_totalprice")).as("spend"))
      .withColumn("neg", -col("spend"))
    spark.catalog.clearCache()
    val (ranked, total, handle) = Ranks.withGlobalRowNumbersHandle(cust, Seq(
      "rn_s" -> Seq(col("spend").desc, col("o_custkey")),
      "rn_f" -> Seq(col("freq").desc, col("o_custkey")),
      "rn_n" -> Seq(col("neg").asc, col("o_custkey"))))
    val want = cust
      .withColumn("rn_s", row_number().over(
        Window.orderBy(col("spend").desc, col("o_custkey"))).cast("long"))
      .withColumn("rn_f", row_number().over(
        Window.orderBy(col("freq").desc, col("o_custkey"))).cast("long"))
      .withColumn("rn_n", row_number().over(
        Window.orderBy(col("neg").asc, col("o_custkey"))).cast("long"))
      .select("o_custkey", "rn_s", "rn_f", "rn_n")
      .as[(Long, Long, Long, Long)].collect().toSet
    val got = ranked.select("o_custkey", "rn_s", "rn_f", "rn_n")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(total === want.size.toLong)
    assert(got === want)
    // the chain keeps exactly ONE generation cached: the two earlier
    // generations were unpersisted as soon as their successor's offset
    // collect materialized (the persisted RDD count proves it — each
    // live cached relation holds one RDD, materialized by the collects)
    assert(spark.sparkContext.getPersistentRDDs.size === 1,
      s"expected 1 cached generation, got ${spark.sparkContext.getPersistentRDDs.size}")
    // and the returned handle is the one that actually releases it
    handle.unpersist(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "handle.unpersist must release the final generation's cache")
  }

  test("q_rfm retains no cache once its consuming action completes (no clearCache)") {
    spark.catalog.clearCache()
    // build + execute exactly as Verify/Bench would — and deliberately
    // do NOT clearCache afterwards: releaseOnConsumption must drop the
    // final rank generation when the consuming write finishes
    val df = SparkEntry.queries("q_rfm")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    // listener dispatch is asynchronous — poll briefly
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.sparkContext.getPersistentRDDs.nonEmpty &&
        System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "q_rfm's final rank generation must be released after consumption")
    // the released cache must not have poisoned the result: a re-run
    // (recompute path, offsets embedded as literals) matches a fresh run
    val again = SparkEntry.queries("q_rfm")(spark, dir)
      .orderBy("rfm").collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    val fresh = SparkEntry.queries("q_rfm")(spark, dir)
      .orderBy("rfm").collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    assert(again === fresh)
  }

  test("withGlobalRowNumbers validates every step and leaks no cache on failure") {
    val cust = Tables.load(spark, dir, "orders")
      .groupBy("o_custkey").agg(Cols.dsum(col("o_totalprice")).as("spend"))
    intercept[IllegalArgumentException] {
      Ranks.withGlobalRowNumbers(cust, Seq(
        "rn_s" -> Seq(col("spend").desc, col("o_custkey")),
        "rn_bad" -> Seq())) // caught up front, before any persist
    }
    spark.catalog.clearCache()
    // failure mid-chain (unresolvable column in step 2) must unpersist
    // the in-flight generation before propagating
    intercept[Exception] {
      Ranks.withGlobalRowNumbers(cust, Seq(
        "rn_s" -> Seq(col("spend").desc, col("o_custkey")),
        "rn_bad" -> Seq(col("no_such_column").asc, col("o_custkey"))))
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "aborted chain leaked a cached generation")
  }

  test("the two-phase plan contains no unpartitioned window") {
    val cust = Tables.load(spark, dir, "orders")
      .groupBy("o_custkey").agg(Cols.dsum(col("o_totalprice")).as("spend"))
    val (ranked, _) =
      Ranks.withGlobalRowNumber(cust, "rn", col("spend").desc, col("o_custkey"))
    val windows = ranked.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, "two-phase rank must not plan any WindowExec")
    ranked.unpersist()
  }
}
