package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the training-pipeline operators added on top
  * of the oracle gate (which proves value equality but not the
  * operator-level contracts asserted here).
  */
class TrainingOpsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = {
    val df = SparkEntry.queries(name)(spark, dir)
    val rows = df.collect()
    spark.catalog.clearCache()
    (df, rows)
  }

  test("text_seq_pack: bin assignment equals concat-and-chunk replay of each stream") {
    val (_, rows) = run("text_seq_pack")
    assert(rows.nonEmpty)
    val budget = ops.TextOps.PackBudget.toLong
    rows.foreach { r =>
      val off = r.getAs[Long]("bin_off")
      assert(off >= 0 && off < budget, s"bin_off $off outside [0, $budget)")
    }
    // replay each (lang, shard) stream: the reported bin/offset must be
    // exactly where the doc's tokens start in the concatenated stream.
    // (A doc longer than the budget legitimately spans bins no later
    // doc starts in, so "no gaps" is NOT an invariant — position is.)
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard")))
      .foreach { case (key, rs) =>
        var cum = 0L
        rs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
          assert(r.getAs[Long]("bin_id") === cum / budget,
            s"$key doc ${r.getAs[Long]("doc_id")}: bin_id != stream position")
          assert(r.getAs[Long]("bin_off") === cum % budget,
            s"$key doc ${r.getAs[Long]("doc_id")}: bin_off != stream position")
          cum += r.getAs[Long]("n_tokens")
        }
      }
  }

  test("q_sketch_cms: estimates dominate exact counts and all probes report") {
    val (_, rows) = run("q_sketch_cms")
    assert(rows.map(_.getAs[String]("token")).toSet === ops.TextOps.stopwords.toSet)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"),
        s"CMS underestimated ${r.getAs[String]("token")}")
      assert(r.getAs[Long]("overcount") ===
        r.getAs[Long]("est") - r.getAs[Long]("exact"))
    }
  }

  test("q_kmeans_step: every cluster reports every dimension and sizes sum to the corpus") {
    val (_, rows) = run("q_kmeans_step")
    val byCluster = rows.groupBy(_.getAs[Long]("c_id"))
    val dims = rows.map(_.getAs[Long]("dim")).toSet
    byCluster.foreach { case (cid, rs) =>
      assert(rs.map(_.getAs[Long]("dim")).toSet === dims,
        s"cluster $cid is missing dimensions")
      assert(rs.map(_.getAs[Long]("n")).toSet.size === 1,
        s"cluster $cid reports inconsistent sizes across dims")
    }
    val corpus = Tables.load(spark, dir, "embeddings").count()
    val sizes = byCluster.values.map(_.head.getAs[Long]("n")).sum
    assert(sizes === corpus, s"cluster sizes $sizes != corpus $corpus")
  }

  test("text_decontam: flags only non-benchmark docs, with positive overlap") {
    val (_, rows) = run("text_decontam")
    assert(rows.nonEmpty, "decontamination found no overlap — vacuous fixture")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 97 != 0, "a benchmark doc flagged itself")
      assert(r.getAs[Long]("n_hits") >= 1)
    }
  }

  test("q_mix_weights: shares sum to 1 and weights rebalance to the uniform target") {
    val (_, rows) = run("q_mix_weights")
    assert(rows.length > 1)
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
    val nLangs = rows.length
    rows.foreach { r =>
      val resampled = r.getAs[Double]("weight") * r.getAs[Double]("share")
      assert(math.abs(resampled - 1.0 / nLangs) < 1e-9,
        "weight * share must hit the uniform target share")
    }
  }

  test("q_bm25: exactly 10 ranked rows, scores strictly ordered") {
    val (_, rows) = run("q_bm25")
    assert(rows.length === 10)
    val byRank = rows.sortBy(_.getAs[Long]("rk"))
    assert(byRank.map(_.getAs[Long]("rk")).toSeq === (1L to 10L))
    val scores = byRank.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores not non-increasing in rank order")
    assert(scores.last > 0.0, "BM25 matched nothing — vacuous result")
  }
}
