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

  test("ccnet bucketing keeps a cutoff-less language: all-NULL quality lands in tail") {
    // a language whose every document is empty has NULL quality
    // throughout -> no sampled cutoffs -> no cutoff row; the LEFT
    // attach must still bucket those documents (as 'tail'), never drop
    // them — the "every doc bucketed exactly once" contract on data
    // the fixture cannot be trusted to contain
    val synth = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "a stitch in time saves nine the more the merrier"),
      (3L, "en", "all that glitters is not gold said the poet"),
      (4L, "xx", ""),
      (5L, "xx", "")).toDF("doc_id", "lang", "text")
    val out = ops.TextOps.ccnetBuckets(synth)
      .select("doc_id", "lang", "bucket")
      .as[(Long, String, String)].collect().sortBy(_._1)
    spark.catalog.clearCache()
    assert(out.length === 5, "every document must be bucketed exactly once")
    assert(out.filter(_._2 == "xx").map(_._3).toSeq === Seq("tail", "tail"))
    assert(out.filter(_._2 == "en").forall(r => Set("head", "middle", "tail")(r._3)))
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

    // the quality ORDERING across tiers is exact by construction for
    // every language; the non-empty and balance claims only make sense
    // once a language has enough docs to fill three tiers (the driver
    // regenerates fixtures between rounds — a 2-doc language must not
    // flake the suite)
    rows.groupBy(_._2).foreach { case (lang, grp) =>
      val byBucket = grp.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      def min2(b: String) = byBucket.get(b).map(_.min)
      def max2(b: String) = byBucket.get(b).map(_.max)
      for {
        hiMin <- min2("head"); midMax <- max2("middle")
      } assert(hiMin >= midMax, s"$lang: head/middle overlap")
      for {
        midMin <- min2("middle"); loMax <- max2("tail")
      } assert(midMin >= loMax, s"$lang: middle/tail overlap")
      if (grp.length >= 30) {
        // thresholds are estimated from a bounded sample, so tercile
        // sizes are approximate — non-empty and loosely balanced
        for (b <- Seq("head", "middle", "tail"))
          assert(byBucket.contains(b), s"$lang: empty $b tier")
        val m = grp.length.toDouble
        byBucket.foreach { case (b, qs) =>
          assert(qs.length >= m / 6 && qs.length <= m / 2,
            s"$lang: $b tier ${qs.length} of ${grp.length} outside [1/6, 1/2]")
        }
      }
    }
    // the claim must not pass vacuously: the current fixture has at
    // least one language big enough for the balance assertions
    assert(rows.groupBy(_._2).values.exists(_.length >= 30))
  }
}
