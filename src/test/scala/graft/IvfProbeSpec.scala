package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the IVF nprobe dial: widening the query-side probe from 1 cell
  * to 2 can only grow each query's candidate set (the probed cells are
  * a superset), so per-query recall@3 must be monotonically >= the
  * single-probe row — the property that makes nprobe a safe latency/
  * recall trade at production scale.
  */
class IvfProbeSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  private def recallByQuery(name: String): Map[Long, Double] =
    SparkEntry.queries(name)(spark, dir)
      .select(col("q_id"), col("recall"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def assertDominates(np1Name: String, np2Name: String): Unit = {
    val np1 = recallByQuery(np1Name)
    val np2 = recallByQuery(np2Name)
    spark.catalog.clearCache()
    assert(np1.keySet === np2.keySet, "query sets must match")
    assert(np1.nonEmpty, "vacuous: no queries")
    np1.keySet.toSeq.sorted.foreach { q =>
      assert(np2(q) >= np1(q) - 1e-12,
        s"q_id=$q: $np2Name recall ${np2(q)} < $np1Name recall ${np1(q)}")
    }
  }

  test("IVF nprobe=2 recall@3 dominates nprobe=1 per query") {
    assertDominates("sim_ann_recall_ivf", "sim_ann_recall_ivf_np2")
  }

  test("IVF+PQ nprobe=2 mean recall@3 is not below nprobe=1") {
    // Weaker than the exact-scored IVF pin above, by design: ADC
    // scores are QUANTIZED, so a widened candidate set can in
    // principle displace a true hit on individual queries
    // (SimilarityOps documents this at the ivfpq_np2 registry entry) —
    // per-query dominance is an empirical property of one fixture, and
    // the driver regenerates testdata between rounds. The robust
    // claim worth pinning is aggregate: probing more cells does not
    // degrade MEAN recall across the query set.
    val np1 = recallByQuery("sim_ann_recall_ivfpq")
    val np2 = recallByQuery("sim_ann_recall_ivfpq_np2")
    spark.catalog.clearCache()
    assert(np1.keySet === np2.keySet, "query sets must match")
    assert(np1.nonEmpty, "vacuous: no queries")
    val mean1 = np1.values.sum / np1.size
    val mean2 = np2.values.sum / np2.size
    assert(mean2 >= mean1 - 1e-12,
      s"mean recall degraded with nprobe=2: $mean2 < $mean1")
  }
}
