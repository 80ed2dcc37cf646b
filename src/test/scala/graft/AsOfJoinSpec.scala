package graft

import graft.plans.{AsOfJoinOps, AsOfJoinPlan}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of join — the whole-operator extension path (custom
  * LogicalPlan + Rule + Strategy + TWO SparkPlans via
  * SparkSessionExtensions). Pins: (1) semantics against a brute-force
  * definition on synthetic data covering ties, no-match keys, nulls,
  * and the strict (`allowExactMatches = false`) dial — each run on
  * BOTH physical paths (broadcast and shuffled sort-merge); (2) the
  * custom execs actually plan (no silent fallback), the broadcast
  * variant with ZERO shuffle exchanges and the shuffled variant with
  * co-partitioning exchanges plus spillable sorts; (3) the injected
  * optimizer rule pushes deterministic left-side filters below the
  * join and leaves non-deterministic ones alone; (4) a skewed
  * hot-key fixture streams through the sort-merge path (the O(1)
  * resident-rows contract that closed the r9 scale caveat); (5) batch
  * equivalence against the fixture-scale composed formulation
  * `q_asof_join` certifies the operator on real data.
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

  /** Run the same assertion on both physical paths — the broadcast
    * exec and the shuffled sort-merge exec must agree row-for-row.
    */
  private def onBothPaths(label: String)(make: Option[Boolean] => DataFrame)(
      check: Map[Long, Option[String]] => Unit): Unit =
    Seq(Some(true), Some(false)).foreach { hint =>
      val df = make(hint)
      val plan = df.queryExecution.executedPlan.toString
      val expected = if (hint.get) "AsOfBroadcast" else "AsOfJoin"
      assert(plan.contains(expected),
        s"$label(hint=$hint): wrong exec planned:\n$plan")
      check(df.select("event_id", "tag").as[(Long, Option[String])].collect().toMap)
    }

  test("backward as-of semantics: latest right row at-or-before, null when none") {
    onBothPaths("backward")(h =>
      AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt", broadcast = h)) { got =>
      assert(got === Map(
        1L -> Some("a@8"),   // 8 <= 10 < 12
        2L -> Some("a@12"),
        3L -> None,          // nothing at-or-before 5
        4L -> None,          // key absent on the right
        5L -> None,          // all of c's rows are later
        6L -> Some("a@20"))) // inclusive: rt == t matches
    }
  }

  test("strict dial: allowExactMatches=false excludes the exact-time row") {
    onBothPaths("backward-strict")(h =>
      AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
        allowExactMatches = false, broadcast = h)) { got =>
      assert(got === Map(
        1L -> Some("a@8"), 2L -> Some("a@12"), 3L -> None, 4L -> None,
        5L -> None,
        6L -> Some("a@12"))) // rt == 20 excluded; latest strictly-before is 12
    }
    onBothPaths("forward-strict")(h =>
      AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
        direction = "forward", allowExactMatches = false, broadcast = h)) { got =>
      assert(got === Map(
        1L -> Some("a@12"), 2L -> Some("a@20"), 3L -> Some("a@8"),
        4L -> None, 5L -> Some("c@9"),
        6L -> None))         // rt == 20 excluded; nothing strictly after
    }
    onBothPaths("nearest-strict")(h =>
      AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
        direction = "nearest", allowExactMatches = false, broadcast = h)) { got =>
      assert(got === Map(
        1L -> Some("a@8"),   // tie (2 vs 2) -> backward
        2L -> Some("a@12"), 3L -> Some("a@8"), 4L -> None, 5L -> Some("c@9"),
        6L -> Some("a@12"))) // exact a@20 excluded; back gap 8 beats no-fwd
    }
  }

  test("strict + duplicate left times: equal-time right rows stay visible as strict-backward for later probes") {
    // right row at t=10 must (a) NOT match the two left rows at t=10
    // under strict, (b) STILL match the later left row at t=15 — the
    // sort-merge lookbehind's two-slot (back1/back2) contract
    val l = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 15L)).toDF("event_id", "k", "t")
    val r = Seq(("a", 3L, "a@3"), ("a", 10L, "a@10")).toDF("rk", "rt", "tag")
    onBothPaths("dup-left-strict")(h =>
      AsOfJoinOps.asof(l, r, "k", "rk", "t", "rt",
        allowExactMatches = false, broadcast = h)) { got =>
      assert(got === Map(1L -> Some("a@3"), 2L -> Some("a@3"), 3L -> Some("a@10")))
    }
  }

  test("null keys and null times never match and are never matched against") {
    val l = Seq((1L, null.asInstanceOf[String], 10L), (2L, "a", 10L)).toDF("event_id", "k", "t")
    val r = Seq(("a", 5L, "ok"), (null.asInstanceOf[String], 1L, "nullkey"))
      .toDF("rk", "rt", "tag")
    onBothPaths("nulls")(h =>
      AsOfJoinOps.asof(l, r, "k", "rk", "t", "rt", broadcast = h)) { got =>
      assert(got === Map(1L -> None, 2L -> Some("ok")))
    }
  }

  test("exchange reuse: two broadcast as-of joins with different dials over ONE shared broadcast build separate indexes") {
    // Both joins broadcast the SAME right side, so Spark's exchange
    // reuse collapses them onto one broadcast id. The per-executor
    // index cache must key on the dials too — keyed only by broadcast
    // id, the strict join would silently reuse the inclusive join's
    // index and return a@20 for event 6.
    val incl = AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
      broadcast = Some(true))
      .select(col("event_id"), col("tag"), lit("incl").as("mode"))
    val strict = AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
      allowExactMatches = false, broadcast = Some(true))
      .select(col("event_id"), col("tag"), lit("strict").as("mode"))
    val ds = incl.unionByName(strict).as[(Long, Option[String], String)]
    val rows = ds.collect()
    // plan read AFTER collect (AQE finalizes lazily): the pin is only
    // meaningful if the two joins really shared one broadcast
    val plan = ds.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"fixture no longer exercises a shared broadcast exchange:\n$plan")
    val byMode = rows.groupBy(_._3)
      .map { case (m, rs) => m -> rs.map(r => r._1 -> r._2).toMap }
    assert(byMode("incl")(6L) === Some("a@20"),   // inclusive: rt == t matches
      s"inclusive join wrong under shared broadcast: ${byMode("incl")}")
    assert(byMode("strict")(6L) === Some("a@12"), // strict: exact a@20 excluded
      s"strict join reused the inclusive index: ${byMode("strict")}")
  }

  test("strategy: small right side auto-selects the broadcast exec; threshold off selects sort-merge") {
    // tiny local fixture sits far under autoBroadcastJoinThreshold
    val auto = AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt")
    assert(auto.queryExecution.executedPlan.toString.contains("AsOfBroadcast"),
      s"stats-based broadcast not chosen:\n${auto.queryExecution.executedPlan}")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shuffled = AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt")
      val plan = shuffled.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin") && !plan.contains("AsOfBroadcast"),
        s"threshold=-1 should fall back to the shuffled exec:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("broadcast path plans ZERO shuffle exchanges; probe-side partitioning passes through") {
    val df = AsOfJoinOps.asof(leftDf.repartition(7), rightDf,
      "k", "rk", "t", "rt", broadcast = Some(true))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), s"no broadcast exchange:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"broadcast variant must not shuffle:\n$plan")
    assert(df.count() === 6)
  }

  test("broadcast probe participates in whole-stage codegen (one fused stage with the probe side)") {
    // projection over the probe: both must fuse into ONE generated
    // loop containing the as-of exec, not break the stage at the
    // operator's edges. Execute first — AQE finalizes stages (and
    // inserts WholeStageCodegen) lazily.
    val df = AsOfJoinOps.asof(
      leftDf.filter(col("t") > 0), rightDf, "k", "rk", "t", "rt",
      broadcast = Some(true)).select(col("k"), col("t"), col("tag"))
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    // the `*(N)` prefix marks membership in codegen stage N
    val joinStage = """\*\((\d+)\) AsOfBroadcast""".r
      .findFirstMatchIn(finalPlan).map(_.group(1))
    assert(joinStage.nonEmpty,
      s"AsOfBroadcastExec not inside a WholeStageCodegen span:\n$finalPlan")
    // the projection above the join must sit in the SAME stage (not
    // cut at the operator's upper edge)
    assert(finalPlan.contains(s"*(${joinStage.get}) Project"),
      s"projection not fused into the as-of codegen stage:\n$finalPlan")
    // and the generated path must compute the same rows as the
    // interpreted one
    val rows = df.orderBy("k", "t").collect().map(_.toString)
    val key = "spark.sql.codegen.wholeStage"
    val prior = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val df2 = AsOfJoinOps.asof(
        leftDf.filter(col("t") > 0), rightDf, "k", "rk", "t", "rt",
        broadcast = Some(true)).select(col("k"), col("t"), col("tag"))
      assert(!df2.queryExecution.executedPlan.toString.contains("WholeStageCodegen"))
      assert(df2.orderBy("k", "t").collect().map(_.toString) === rows,
        "interpreted and generated broadcast probes disagree")
    } finally spark.conf.set(key, prior)
  }

  test("sort-merge path: EnsureRequirements co-partitions both children and inserts spillable sorts") {
    // the streaming merge is only correct when equal keys land in the
    // same partition index on both sides AND each side arrives sorted
    // by (key, time) — pin that the planner inserts both exchanges
    // and both sorts rather than accepting the children's layout
    val df = AsOfJoinOps.asof(leftDf.repartition(5, col("t")),
      rightDf.repartition(9, col("rt")), "k", "rk", "t", "rt",
      broadcast = Some(false))
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(k#".r.findFirstIn(plan).isDefined,
      s"left side not re-clustered on the key:\n$plan")
    assert("Exchange hashpartitioning\\(rk#".r.findFirstIn(plan).isDefined,
      s"right side not re-clustered on the key:\n$plan")
    assert("Sort \\[k#\\d+ ASC NULLS FIRST, t#".r.findFirstIn(plan).isDefined,
      s"left side not sorted on (key, time):\n$plan")
    assert("Sort \\[rk#\\d+ ASC NULLS FIRST, rt#".r.findFirstIn(plan).isDefined,
      s"right side not sorted on (key, time):\n$plan")
    // and the merge is still correct under the hostile input partitioning
    assert(df.select("event_id", "tag").as[(Long, Option[String])]
      .collect().toMap.apply(2L) === Some("a@12"))
  }

  test("skewed hot key streams through the sort-merge path (O(1) resident rows by construction)") {
    // one hot key owning the whole right side — the r9 hash-index
    // formulation buffered all of it per task; the sort-merge path
    // keeps a 3-row window and lets SortExec spill. Closed-form
    // oracle: right times are exactly 0..N-1 on key "hot", so the
    // backward match for a left row at time t is min(t, N-1).
    val n = 30000L
    val r = spark.range(n).select(lit("hot").as("rk"), col("id").as("rt"))
    val l = spark.range(2 * n).select(lit("hot").as("k"), (col("id") * 2 + 1).as("t"))
      .unionAll(Seq(("cold", 5L)).toDF("k", "t")) // second key pins group transitions
    val joined = AsOfJoinOps.asof(l, r, "k", "rk", "t", "rt", broadcast = Some(false))
    assert(joined.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val got = joined.agg(
      sum("rt").as("s"), count(col("rt")).as("m"), count(lit(1)).as("total"))
      .as[(Long, Long, Long)].head()
    // left times t = 1, 3, .. 4n-1 on "hot": match = min(t, n-1);
    // "cold" has no right rows -> null. The n/2 left rows with t < n
    // match themselves (sum (n/2)^2); the rest saturate at n-1.
    val half = n / 2
    val expect = half * half + (2 * n - half) * (n - 1)
    assert(got === ((expect, 2 * n, 2 * n + 1)))
  }

  test("deterministic left-side filters push below the join; right-side and non-deterministic stay above") {
    val joined = AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt")
      .filter(col("event_id") > 1 && col("tag").isNotNull &&
        rand() < 2.0) // always true, but must NOT be relocated
    val optimized = joined.queryExecution.optimizedPlan
    val asOf = optimized.collectFirst { case a: AsOfJoinPlan => a }.get
    // pushed: the left subtree now filters event_id
    assert(asOf.left.toString.contains("event_id"),
      s"left predicate not pushed:\n$optimized")
    assert(!asOf.left.toString.contains("rand"),
      s"non-deterministic predicate must not move below the join:\n$optimized")
    // kept: tag (right side) still filtered ABOVE the join
    val above = optimized.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.references.map(_.name).toSeq.contains("tag") => f
    }
    assert(above.isDefined, s"right-side predicate vanished:\n$optimized")
    assert(joined.select("event_id").as[Long].collect().sorted === Array(2L, 6L))
  }

  test("forward direction: earliest right row at-or-after, null when none") {
    onBothPaths("forward")(h =>
      AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
        direction = "forward", broadcast = h)) { got =>
      assert(got === Map(
        1L -> Some("a@12"),  // smallest rt >= 10
        2L -> Some("a@20"),
        3L -> Some("a@8"),   // smallest rt >= 5
        4L -> None,          // key absent on the right
        5L -> Some("c@9"),
        6L -> Some("a@20"))) // inclusive: rt == t matches
    }
    intercept[IllegalArgumentException] {
      AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt", direction = "sideways")
    }
  }

  test("nearest direction: smaller absolute gap wins, ties to backward") {
    onBothPaths("nearest")(h =>
      AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
        direction = "nearest", broadcast = h)) { got =>
      assert(got === Map(
        1L -> Some("a@8"),   // gaps: back 2 vs fwd 2 — TIE, backward wins
        2L -> Some("a@12"),  // back 3 vs fwd 5
        3L -> Some("a@8"),   // no backward, forward only
        4L -> None,
        5L -> Some("c@9"),
        6L -> Some("a@20"))) // exact hit
    }
    // nearest + tolerance: the chosen candidate must sit in the band
    onBothPaths("nearest-tol")(h =>
      AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
        direction = "nearest", tolerance = Some(1L), broadcast = h)) { tol =>
      assert(tol(1L) === None)        // both gaps are 2 > 1
      assert(tol(6L) === Some("a@20")) // gap 0
    }
  }

  test("tolerance band: matches farther than the band degrade to null") {
    onBothPaths("tolerance")(h =>
      AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
        tolerance = Some(2L), broadcast = h)) { got =>
      assert(got === Map(
        1L -> Some("a@8"),   // gap 2 <= 2
        2L -> None,          // latest-at-or-before is a@12, gap 3 > 2
        3L -> None, 4L -> None, 5L -> None,
        6L -> Some("a@20"))) // exact hit, gap 0
    }
    intercept[IllegalArgumentException] {
      AsOfJoinOps.asof(leftDf, rightDf, "k", "rk", "t", "rt",
        tolerance = Some(-1L))
    }
  }

  test("self-join: shared attribute ids are re-aliased, right columns bind correctly") {
    val base = Seq((1L, "a", 10L, "l@10"), (2L, "a", 20L, "l@20"))
      .toDF("event_id", "k", "t", "tag")
    // join a dataset against ITSELF (strictly-earlier rows): without
    // the re-alias, output would duplicate exprIds and the right
    // columns would silently carry left values
    val got = AsOfJoinOps.asof(base, base.withColumn("t", col("t") + 1), "k", "k", "t", "t")
      .toDF("event_id", "k", "t", "tag", "r_event_id", "r_k", "r_t", "r_tag")
      .select("event_id", "r_tag", "r_t").as[(Long, Option[String], Option[Long])]
      .collect().map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    // right times are shifted +1, so row 1 (t=10) has no right row <= 10
    // except... right times are 11 and 21: t=10 -> none; t=20 -> 11
    assert(got(1L) === ((None, None)))
    assert(got(2L) === ((Some("l@10"), Some(11L))))
  }

  test("construction-time guards: mismatched time/key types, float and decimal keys rejected") {
    val l = Seq((1L, 1.5, 10L)).toDF("event_id", "fk", "t")
    val r = Seq((1.5, 5L, "x")).toDF("rfk", "rt", "tag")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoinOps.asof(
        l, r.withColumn("rt", col("rt").cast("int")), "event_id", "rt", "t", "rt")
    }
    assert(e1.getMessage.contains("time columns"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoinOps.asof(l, r, "fk", "rfk", "t", "rt")
    }
    assert(e2.getMessage.contains("floating-point"))
    // int left key vs long right key: hash-clusters and compares
    // unequal for the same value — rejected at construction, not
    // silent empty results
    val e3 = intercept[IllegalArgumentException] {
      AsOfJoinOps.asof(
        l.withColumn("event_id", col("event_id").cast("int")), r.withColumn("rid", lit(1L)),
        "event_id", "rid", "t", "rt")
    }
    assert(e3.getMessage.contains("key columns must share one type"))
    val e4 = intercept[IllegalArgumentException] {
      AsOfJoinOps.asof(
        l.withColumn("dk", col("event_id").cast("decimal(10,2)")),
        r.withColumn("rdk", lit(1L).cast("decimal(10,2)")), "dk", "rdk", "t", "rt")
    }
    assert(e4.getMessage.contains("decimal"))
  }

  test("fixture-scale equivalence with the composed window formulation, both paths") {
    def native(hint: Option[Boolean]) = {
      val ev = Tables.load(spark, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("event_id").as("purchase_id"))
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("purchase_id"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsOfJoinOps.asof(c, p, "user_id", "p_user", "ts", "p_ts", broadcast = hint)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("purchase_id"), col("p_ts").as("purchase_ts"))
    }
    val composed = SparkEntry.queries("q_asof_join")(spark, dir)
    val c = composed.collect().map(_.toString).sorted
    Seq(Some(true), Some(false)).foreach { hint =>
      val n = native(hint).collect().map(_.toString).sorted
      assert(n.length === c.length, s"hint=$hint")
      assert(n === c, s"hint=$hint")
    }
    spark.catalog.clearCache()
  }
}
