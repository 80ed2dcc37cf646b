package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Validates q_kmeans_step against a plain-Scala reference
  * implementation (independent of all Spark/DuckDB machinery):
  *
  *  - the emitted centroids are the per-cluster means of the
  *    cosine-argmax assignment against the initial centroids (within
  *    the documented 1e-9 quantization);
  *  - one Lloyd step never decreases the spherical objective
  *    (mean best-cosine), the convergence property that justifies the
  *    runbook's "iterate by feeding centroids back" claim. Cosine is
  *    scale-invariant, so the unnormalized mean is a valid spherical
  *    update.
  */
class KmeansSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"
  private val K = 8

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na * nb)
  }

  private def bestCluster(v: Array[Double], cents: Seq[(Long, Array[Double])]): Long =
    // ties to the smaller centroid id — the query's convention
    cents.map { case (id, c) => (id, cos(v, c)) }
      .minBy { case (id, s) => (-s, id) }._1

  private def objective(vs: Seq[Array[Double]], cents: Seq[(Long, Array[Double])]): Double =
    vs.map(v => cents.map(c => cos(v, c._2)).max).sum / vs.size

  test("Lloyd step emits the reference means and improves the objective") {
    // exact float->double widening, matching the query's array CAST —
    // a toString->parse round trip would drift up to ~1e-8 per element
    val vecs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val c0 = vecs.take(K).map { case (id, v) => (id, v) }.toSeq

    val step = SparkEntry.queries("q_kmeans_step")(spark, dir).collect()
    spark.catalog.clearCache()
    val c1 = step.groupBy(_.getAs[Long]("c_id")).map { case (cid, rows) =>
      cid -> rows.sortBy(_.getAs[Long]("dim")).map(_.getAs[Double]("c_val")).toArray
    }.toSeq

    // reference: assign every vector to its cosine-argmax initial
    // centroid, then per-cluster per-dim means
    val assigned = vecs.map { case (id, v) => (bestCluster(v, c0), v) }
    val refMeans = assigned.groupBy(_._1).map { case (cid, vs) =>
      val n = vs.size
      val dim = vs.head._2.length
      cid -> Array.tabulate(dim)(d => vs.map(_._2(d)).sum / n)
    }

    assert(c1.map(_._1).toSet === refMeans.keySet, "cluster ids diverge")
    c1.foreach { case (cid, got) =>
      val want = refMeans(cid)
      assert(got.length === want.length)
      got.zip(want).zipWithIndex.foreach { case ((g, w), d) =>
        // 1e-9 floor-quantization per element
        assert(math.abs(g - w) <= 2e-9, s"cluster $cid dim $d: $g vs $w")
      }
    }

    val vs = vecs.map(_._2).toSeq
    val before = objective(vs, c0)
    val after = objective(vs, c1)
    assert(after >= before - 1e-9,
      s"Lloyd step worsened the objective: $before -> $after")
  }
}
