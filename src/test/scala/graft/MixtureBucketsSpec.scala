package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Structural pins for the round-8 mixture/bucketing operators: the
  * α=1/2 temperature sampler must actually rebalance toward
  * low-resource languages, and the CCNet tercile thresholds must
  * induce a clean quality ordering head > middle > tail within every
  * language. The oracle compare pins exact values; these pin the
  * SEMANTICS the exact values are supposed to have.
  */
class MixtureBucketsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  test("q_mix_temperature: probabilities normalize, weights invert the share order") {
    val rows = run("q_mix_temperature")
      .select("lang", "share", "p_temp", "weight")
      .as[(String, Double, Double, Double)].collect()
    spark.catalog.clearCache()

    assert(rows.length >= 2)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-12, "p_temp must sum to 1")
    rows.foreach { case (lang, share, p, w) =>
      assert(share > 0 && p > 0 && w > 0, s"$lang: non-positive mixture value")
      // α = 1/2 compresses toward uniform: p is strictly between the
      // natural share and the uniform 1/n on whichever side share is
      val uniform = 1.0 / rows.length
      if (share < uniform) assert(p > share && p < uniform + 1e-12, s"$lang")
      if (share > uniform) assert(p < share && p > uniform - 1e-12, s"$lang")
    }
    // resampling factor is antitone in share: rarer language, bigger boost
    val byShare = rows.sortBy(_._2).map(_._4)
    assert(byShare.zip(byShare.tail).forall { case (hi, lo) => hi >= lo },
      "weights must be non-increasing in share")
  }

  test("text_ccnet_buckets: per-language quality ordering head >= middle >= tail") {
    val rows = run("text_ccnet_buckets")
      .select("doc_id", "lang", "quality", "bucket")
      .as[(Long, String, Double, String)].collect()
    spark.catalog.clearCache()

    val total = Tables.load(spark, dir, "documents").count()
    assert(rows.length.toLong === total, "every doc must be bucketed exactly once")
    assert(rows.map(_._1).distinct.length === rows.length)
    assert(rows.forall(r => Set("head", "middle", "tail")(r._4)))

    rows.groupBy(_._2).foreach { case (lang, grp) =>
      val byBucket = grp.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      // thresholds are estimated from a bounded sample, so tercile
      // sizes are approximate — but every tier must be non-empty and
      // the quality ORDERING across tiers is exact by construction
      for (b <- Seq("head", "middle", "tail"))
        assert(byBucket.contains(b), s"$lang: empty $b tier")
      assert(byBucket("head").min >= byBucket("middle").max, s"$lang: head/middle overlap")
      assert(byBucket("middle").min >= byBucket("tail").max, s"$lang: middle/tail overlap")
      // and approximately balanced (loose band: sample-estimated cutoffs)
      val m = grp.length.toDouble
      byBucket.foreach { case (b, qs) =>
        assert(qs.length >= m / 6 && qs.length <= m / 2,
          s"$lang: $b tier ${qs.length} of ${grp.length} outside [1/6, 1/2]")
      }
    }
  }
}
