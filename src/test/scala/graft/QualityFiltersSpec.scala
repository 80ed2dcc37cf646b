package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-8 additions: the Gopher-style composite filter
  * and the minhash signature-accuracy row.
  */
class QualityFiltersSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.01"

  test("text_gopher_quality: verdict is exactly the conjunction of its published rules") {
    val rows = SparkEntry.queries("text_gopher_quality")(spark, dir).collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val keep = r.getAs[Long]("n_tokens") >= 20 && r.getAs[Long]("n_tokens") <= 1000 &&
        r.getAs[Double]("mean_word_len") >= 3.8 && r.getAs[Double]("mean_word_len") <= 10.0 &&
        r.getAs[Double]("alpha_frac") >= 0.8 &&
        r.getAs[Long]("n_stop") >= 1 &&
        r.getAs[Double]("dup3_frac") <= 0.05
      assert(r.getAs[String]("verdict") === (if (keep) "keep" else "drop"),
        s"verdict inconsistent with signals for doc ${r.get(0)}")
    }
    // the filter must actually FIRE on this corpus — a filter that
    // never drops (or never keeps) is untested code
    val verdicts = rows.map(_.getAs[String]("verdict")).toSet
    assert(verdicts === Set("keep", "drop"))
  }

  test("dedup_minhash_est: estimates are exact twelfths in [0,1] with consistent error") {
    val rows = SparkEntry.queries("dedup_minhash_est")(spark, dir).collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est")
      val j = r.getAs[Double]("jaccard")
      val err = r.getAs[Double]("abs_err")
      val twelfths = est * 12
      assert(twelfths == math.rint(twelfths) && est >= 0.0 && est <= 1.0,
        s"est must be an exact k/12, got $est")
      assert(err === math.abs(est - j))
      assert(j >= 0.5, "only verified pairs may appear")
    }
  }

  test("identical shingle sets get identical signatures (est = 1 on true duplicates)") {
    import spark.implicits._
    val sets = Seq(
      (1L, Seq(17L, 99L, 123456789L)),
      (2L, Seq(17L, 99L, 123456789L)), // same set, different doc
      (3L, Seq(5L, 7L))
    ).toDF("doc_id", "shingles")
    val sigs = ops.DedupOps.minhashSigs(sets)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L), "equal sets must hash to equal signatures")
    assert(sigs(1L) !== sigs(3L), "different sets should differ (these do)")
  }
}
