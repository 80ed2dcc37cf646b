package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins that q_hybrid_rrf is genuinely HYBRID: both rankers must place
  * rows in the fused top-10 (the first cut of this query pruned query
  * terms by an absolute df threshold that this corpus's all-common
  * vocabulary reduced to zero sparse candidates — oracle-green because
  * the oracle was equally vacuous; this spec makes that failure mode
  * loud), and the fused ordering must actually follow the rrf score.
  */
class HybridRrfSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  test("both rankers contribute rows and rrf ordering is honored") {
    val out = SparkEntry.queries("q_hybrid_rrf")(spark, dir)
      .select("q_id", "doc_id", "rs", "rd", "rrf", "rk")
      .collect()
    spark.catalog.clearCache()
    assert(out.nonEmpty, "vacuous: no fused rows")
    val sparseRanked = out.count(!_.isNullAt(2))
    val denseRanked = out.count(!_.isNullAt(3))
    assert(sparseRanked > 0, "sparse (BM25) ranker placed no rows — vacuous hybrid")
    assert(denseRanked > 0, "dense (cosine) ranker placed no rows — vacuous hybrid")
    // per query: exactly <=10 rows, rk dense from 1, rrf non-increasing
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val byRk = rows.sortBy(_.getLong(5))
      assert(byRk.length <= 10, s"q_id=$q emits ${byRk.length} rows")
      assert(byRk.map(_.getLong(5)).toSeq == (1L to byRk.length).toSeq,
        s"q_id=$q ranks not dense")
      val rrfs = byRk.map(_.getDouble(4)).toSeq
      assert(rrfs == rrfs.sorted.reverse, s"q_id=$q rrf not non-increasing")
      // the query doc itself is excluded from its own results
      assert(!rows.exists(_.getLong(1) == q), s"q_id=$q returned itself")
    }
  }
}
