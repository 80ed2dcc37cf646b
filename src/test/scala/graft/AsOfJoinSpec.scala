package graft

import graft.plans.{AsOfJoinOps, AsOfJoinPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of join — the whole-operator extension path (custom
  * LogicalPlan + Rule + Strategy + SparkPlan via
  * SparkSessionExtensions). Pins: (1) semantics against a brute-force
  * definition on synthetic data covering ties, no-match keys, and
  * nulls; (2) the custom exec actually plans (no silent fallback);
  * (3) the injected optimizer rule pushes left-side filters below the
  * join; (4) batch equivalence against the fixture-scale composed
  * formulation `q_asof_join` certifies the operator on real data.
  */
class AsOfJoinSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def leftDf = Seq(
    // (event, key, t)
    (1L, "a", 10L), (2L, "a", 15L), (3L, "a", 5L),
    (4L, "b", 100L),                    // key with no right rows
    (5L, "c", 7L),                      // before every right row of c
    (6L, "a", 20L)                      // exactly at a right timestamp
  ).toDF("event_id", "k", "t")

  private def rightDf = Seq(
    ("a", 8L, "a@8"), ("a", 12L, "a@12"), ("a", 20L, "a@20"),
    ("c", 9L, "c@9")
  ).toDF("rk", "rt", "tag")

  test("backward as-of semantics: latest right row at-or-before, null when none") {
    val got = AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt")
      .select("event_id", "tag").as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> Some("a@8"),   // 8 <= 10 < 12
      2L -> Some("a@12"),
      3L -> None,          // nothing at-or-before 5
      4L -> None,          // key absent on the right
      5L -> None,          // all of c's rows are later
      6L -> Some("a@20"))) // inclusive: rt == t matches
  }

  test("null keys and null times never match and are never matched against") {
    val l = Seq((1L, null.asInstanceOf[String], 10L), (2L, "a", 10L)).toDF("event_id", "k", "t")
    val r = Seq(("a", 5L, "ok"), (null.asInstanceOf[String], 1L, "nullkey"))
      .toDF("rk", "rt", "tag")
    val got = AsOfJoinOps.asof(l, r, "k", "rk", "t", "rt")
      .select("event_id", "tag").as[(Long, Option[String])].collect().toMap
    assert(got === Map(1L -> None, 2L -> Some("ok")))
  }

  test("the custom exec plans (no fallback) and survives a wide input") {
    val df = AsOfJoinOps.asof(leftDf.repartition(7), rightDf.repartition(3),
      "k", "rk", "t", "rt")
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      s"native exec missing:\n${df.queryExecution.executedPlan}")
    assert(df.count() === 6)
  }

  test("EnsureRequirements hash-clusters both children on their keys") {
    // the exec's per-partition merge is only correct when equal keys
    // land in the same partition index on both sides — pin that the
    // planner inserts the two co-partitioning exchanges rather than
    // accepting whatever partitioning the children arrive with
    val df = plans.AsOfJoinOps.asof(leftDf.repartition(5, col("t")),
      rightDf.repartition(9, col("rt")), "k", "rk", "t", "rt")
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(k#".r.findFirstIn(plan).isDefined,
      s"left side not re-clustered on the key:\n$plan")
    assert("Exchange hashpartitioning\\(rk#".r.findFirstIn(plan).isDefined,
      s"right side not re-clustered on the key:\n$plan")
    // and the merge is still correct under the hostile input partitioning
    assert(df.select("event_id", "tag").as[(Long, Option[String])]
      .collect().toMap.apply(2L) === Some("a@12"))
  }

  test("left-side filters push below the join; right-side filters stay above") {
    val joined = AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt")
      .filter(col("event_id") > 1 && col("tag").isNotNull)
    val optimized = joined.queryExecution.optimizedPlan
    val asOf = optimized.collectFirst { case a: AsOfJoinPlan => a }.get
    // pushed: the left subtree now filters event_id
    assert(asOf.left.toString.contains("event_id"),
      s"left predicate not pushed:\n$optimized")
    // kept: tag (right side) still filtered ABOVE the join
    val above = optimized.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.references.map(_.name).toSeq.contains("tag") => f
    }
    assert(above.isDefined, s"right-side predicate vanished:\n$optimized")
    assert(joined.select("event_id").as[Long].collect().sorted === Array(2L, 6L))
  }

  test("forward direction: earliest right row at-or-after, null when none") {
    val got = plans.AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
        direction = "forward")
      .select("event_id", "tag").as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> Some("a@12"),  // smallest rt >= 10
      2L -> Some("a@20"),
      3L -> Some("a@8"),   // smallest rt >= 5
      4L -> None,          // key absent on the right
      5L -> Some("c@9"),
      6L -> Some("a@20"))) // inclusive: rt == t matches
    intercept[IllegalArgumentException] {
      plans.AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt", direction = "sideways")
    }
  }

  test("nearest direction: smaller absolute gap wins, ties to backward") {
    val got = plans.AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
        direction = "nearest")
      .select("event_id", "tag").as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> Some("a@8"),   // gaps: back 2 vs fwd 2 — TIE, backward wins
      2L -> Some("a@12"),  // back 3 vs fwd 5
      3L -> Some("a@8"),   // no backward, forward only
      4L -> None,
      5L -> Some("c@9"),
      6L -> Some("a@20"))) // exact hit
    // nearest + tolerance: the chosen candidate must sit in the band
    val tol = plans.AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
        direction = "nearest", tolerance = Some(1L))
      .select("event_id", "tag").as[(Long, Option[String])].collect().toMap
    assert(tol(1L) === None)        // both gaps are 2 > 1
    assert(tol(6L) === Some("a@20")) // gap 0
  }

  test("tolerance band: matches farther than the band degrade to null") {
    val got = plans.AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
        tolerance = Some(2L))
      .select("event_id", "tag").as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> Some("a@8"),   // gap 2 <= 2
      2L -> None,          // latest-at-or-before is a@12, gap 3 > 2
      3L -> None, 4L -> None, 5L -> None,
      6L -> Some("a@20"))) // exact hit, gap 0
    intercept[IllegalArgumentException] {
      plans.AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
        tolerance = Some(-1L))
    }
  }

  test("self-join: shared attribute ids are re-aliased, right columns bind correctly") {
    val base = Seq((1L, "a", 10L, "l@10"), (2L, "a", 20L, "l@20"))
      .toDF("event_id", "k", "t", "tag")
    // join a dataset against ITSELF (strictly-earlier rows): without
    // the re-alias, output would duplicate exprIds and the right
    // columns would silently carry left values
    val got = plans.AsOfJoinOps.asof(base, base.withColumn("t", col("t") + 1), "k", "k", "t", "t")
      .toDF("event_id", "k", "t", "tag", "r_event_id", "r_k", "r_t", "r_tag")
      .select("event_id", "r_tag", "r_t").as[(Long, Option[String], Option[Long])]
      .collect().map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    // right times are shifted +1, so row 1 (t=10) has no right row <= 10
    // except... right times are 11 and 21: t=10 -> none; t=20 -> 11
    assert(got(1L) === ((None, None)))
    assert(got(2L) === ((Some("l@10"), Some(11L))))
  }

  test("construction-time guards: mismatched time types and float keys are rejected") {
    val l = Seq((1L, 1.5, 10L)).toDF("event_id", "fk", "t")
    val r = Seq((1.5, 5L, "x")).toDF("rfk", "rt", "tag")
    val e1 = intercept[IllegalArgumentException] {
      plans.AsOfJoinOps.asof(
        l, r.withColumn("rt", col("rt").cast("int")), "event_id", "rt", "t", "rt")
    }
    assert(e1.getMessage.contains("time columns"))
    val e2 = intercept[IllegalArgumentException] {
      plans.AsOfJoinOps.asof(l, r, "fk", "rfk", "t", "rt")
    }
    assert(e2.getMessage.contains("floating-point"))
  }

  test("fixture-scale equivalence with the composed window formulation") {
    val native = {
      val ev = Tables.load(spark, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("event_id").as("purchase_id"))
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("purchase_id"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsOfJoinOps.asof(c, p, "user_id", "p_user", "ts", "p_ts")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("purchase_id"), col("p_ts").as("purchase_ts"))
    }
    val composed = SparkEntry.queries("q_asof_join")(spark, dir)
    val n = native.collect().map(_.toString).sorted
    val c = composed.collect().map(_.toString).sorted
    spark.catalog.clearCache()
    assert(n.length === c.length)
    assert(n === c)
  }
}
