package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Conservation law for q_events_attribution, checked against an
  * independent driver-side replay of the U-shaped model over the raw
  * fixture: the per-channel rollup must hand out exactly the credit
  * the per-user formula grants — 1,000,000 ppm per converting user
  * with 1 or 2 touches, 800000 + (n-2)·(200000 div (n-2)) for n >= 3
  * (integer middle shares truncate, never exceed). A join slip, a
  * tie-break drift, or a rollup bug all break the equality.
  */
class AttributionSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  test("per-channel credits sum to the per-user grants exactly") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime * 1000 + r.getTimestamp(3).getNanos / 1000 % 1000))

    // first purchase per user: min by (ts, event_id)
    val firstPurchase = ev.filter(_._3 == "purchase")
      .groupBy(_._1)
      .map { case (u, rows) => u -> rows.map(r => (r._4, r._2)).min._1 }

    val expectedTotal = firstPurchase.toSeq.map { case (u, fpTs) =>
      val n = ev.count(e => e._1 == u && e._3 != "purchase" && e._4 < fpTs).toLong
      if (n == 0) 0L
      else if (n <= 2) 1000000L
      else 800000L + (n - 2) * (200000L / (n - 2))
    }.sum

    val got = SparkEntry.queries("q_events_attribution")(spark, dir)
      .agg(sum("credit_ppm_total")).collect()(0).getLong(0)
    assert(expectedTotal > 0)
    assert(got === expectedTotal)
  }
}
