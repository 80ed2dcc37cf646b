package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-level contracts for the sweep-line interval-overlap query
  * and the priority-sampling query, beyond the oracle gate's value
  * equality: the sweep peak is checked against a brute-force occupancy
  * count, and the weighted sample against a driver-side replay of the
  * priority formula over the whole table.
  */
class SweepSampleSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  test("q_interval_overlap: peak and first-peak instant match brute-force occupancy") {
    val rows = SparkEntry.queries("q_interval_overlap")(spark, dir).collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    val events = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("ts").cast("long").as("sec"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val gap = 600L // 10 minutes
    rows.foreach { r =>
      val tpe = r.getAs[String]("event_type")
      val starts = events(tpe)
      // occupancy at an interval start t = #{s : s <= t < s + gap};
      // the sweep peak is always attained at some start instant
      def occ(t: Long): Int = starts.count(s => s <= t && t < s + gap)
      val peaks = starts.map(occ)
      assert(r.getAs[Long]("peak_conc") === peaks.max.toLong, s"$tpe peak")
      val firstAt = starts.filter(t => occ(t) == peaks.max).min
      assert(r.getAs[java.sql.Timestamp]("first_peak_at").getTime / 1000 === firstAt,
        s"$tpe first peak instant")
    }
  }

  test("intervalOverlap: randomized intervals with forced timestamp collisions match brute force") {
    // minute-granularity starts in a 2-hour span with a 10-minute gap:
    // dense collisions AND ends landing exactly on other starts — the
    // tie cases the RANGE-frame sweep must get right (an interval
    // ending at t frees its slot before one starting at t takes it)
    val rnd = new scala.util.Random(42)
    val base = 1700000000L // fixed epoch anchor
    val data = Seq.fill(300) {
      val tpe = s"t${rnd.nextInt(3)}"
      val sec = base + rnd.nextInt(120) * 60L
      (tpe, new java.sql.Timestamp(sec * 1000))
    }
    val df = spark.createDataFrame(data).toDF("event_type", "ts")
    val got = ops.EventOps.intervalOverlap(df, "10 minutes").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("peak_conc"), r.getAs[java.sql.Timestamp]("first_peak_at").getTime / 1000))
      .toMap
    val gap = 600L
    data.groupBy(_._1).foreach { case (tpe, evs) =>
      val starts = evs.map(_._2.getTime / 1000)
      def occ(t: Long): Int = starts.count(s => s <= t && t < s + gap)
      val peak = starts.map(occ).max
      val firstAt = starts.filter(t => occ(t) == peak).min
      assert(got(tpe) === (peak.toLong, firstAt), s"$tpe sweep vs brute force")
    }
  }

  test("q_sample_weighted: top-20 by replayed priority, ranks dense, priorities exact") {
    val rows = SparkEntry.queries("q_sample_weighted")(spark, dir).collect()
      .sortBy(_.getAs[Long]("rk"))
    spark.catalog.clearCache()
    assert(rows.length === 20)
    assert(rows.map(_.getAs[Long]("rk")).toSeq === (1L to 20L))
    // driver-side replay of pri = w / (hex60("ws|" + key) / 2^60) over
    // the whole table — the query's 20 must be the global argmax set
    val all = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map { r =>
        val k = r.getLong(0); val w = r.getDouble(1)
        val u = Cols.hex60Scalar(s"ws|$k") / 1.152921504606846976e18
        (k, w, w / u)
      }
    val expected = all.sortBy { case (k, _, p) => (-p, k) }.take(20)
    rows.zip(expected).foreach { case (got, (k, w, p)) =>
      assert(got.getAs[Long]("o_orderkey") === k)
      assert(got.getAs[Double]("w") === w)
      assert(got.getAs[Double]("pri") === p, s"priority drift for key $k")
    }
  }
}
