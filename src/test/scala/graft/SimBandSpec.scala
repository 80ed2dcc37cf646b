package graft

import graft.ops.DedupOps
import org.scalatest.funsuite.AnyFunSuite

/** SimHash band sizing: the band width is a candidate-volume knob, not
  * a semantics knob. With 4 disjoint bands, Hamming <= 3 recall is
  * exact by pigeonhole at ANY width, so the pair set must be identical
  * across widths — that invariance is what lets the query size its
  * bands from the corpus count while the fixed-width oracle SQL stays
  * valid.
  */
class SimBandSpec extends AnyFunSuite with SparkSessionTestWrapper {

  val dir = "/root/testdata/sf0.001"

  test("simBandBits: ceil(log2 n) clamped to [8, 15]") {
    assert(DedupOps.simBandBits(1) === 8)
    assert(DedupOps.simBandBits(200) === 8)
    assert(DedupOps.simBandBits(256) === 8)
    assert(DedupOps.simBandBits(257) === 9)
    assert(DedupOps.simBandBits(5000) === 13)
    assert(DedupOps.simBandBits(32768) === 15)
    // saturation: beyond 2^15 docs the 60-bit/4-band scheme is at its
    // capacity ceiling — candidates grow O(N^2/2^15) and the documented
    // remedy is a wider signature, not a wider band
    assert(DedupOps.simBandBits(1000000) === 15)
    assert(DedupOps.simBandBits(Long.MaxValue) === 15)
  }

  test("near-dup pair set is invariant to band width (exact recall)") {
    def pairs(bits: Int): Set[(Long, Long, Long)] =
      DedupOps.simhashPairs(spark, dir, bits).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val narrow = pairs(8)
    val wide = pairs(15)
    assert(narrow.nonEmpty, "fixture must produce at least one near-dup pair")
    assert(narrow === wide)
    spark.catalog.clearCache()
  }

  test("120-bit wide pair set is invariant to band width (4 paired-key pigeonhole)") {
    def pairs(bits: Int): Set[(Long, Long, Long)] =
      DedupOps.simhashPairsWide(spark, dir, bits).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val narrow = pairs(8)
    val wide = pairs(15)
    assert(narrow.nonEmpty, "fixture must produce at least one near-dup pair")
    assert(narrow === wide)
    spark.catalog.clearCache()
  }

  test("family knee: narrow at and below 2^16, wide above") {
    assert(DedupOps.SimWideKnee === 65536L)
    assert(!DedupOps.useWideSimhash(1))
    assert(!DedupOps.useWideSimhash(DedupOps.SimWideKnee))
    assert(DedupOps.useWideSimhash(DedupOps.SimWideKnee + 1))
    assert(DedupOps.useWideSimhash(Long.MaxValue))
  }

  test("auto family crossing: selector output equals the selected family's on both sides of the knee") {
    def collect(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // same fixture corpus, forced count estimates on either side of the
    // knee — the selector must reproduce each family's exact pair set
    // (including the definition change: Hamming over 60 vs 120 bits)
    val below = collect(DedupOps.simhashPairsAuto(spark, dir, DedupOps.SimWideKnee))
    val narrow = collect(DedupOps.simhashPairs(spark, dir,
      DedupOps.simBandBits(DedupOps.SimWideKnee)))
    assert(below === narrow)
    val above = collect(DedupOps.simhashPairsAuto(spark, dir, DedupOps.SimWideKnee + 1))
    val wide = collect(DedupOps.simhashPairsWide(spark, dir,
      DedupOps.simBandBits(DedupOps.SimWideKnee + 1)))
    assert(above === wide)
    assert(narrow.nonEmpty && wide.nonEmpty)
    spark.catalog.clearCache()
  }
}
