package graft

import graft.ops.DedupOps
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Structural pins for the two training-data miners added in round 8:
  * the cross-document duplicated-span fraction (dedup_span_frac) and
  * semi-hard negative mining (sim_hard_negatives). The oracle compare
  * pins exact values; these tests pin the SEMANTIC claims a consumer
  * relies on — planted near-duplicates must saturate the span signal,
  * negatives must actually be negatives, and the semi-hard flag must
  * agree with the hardest-positive score it is defined against.
  */
class SpanHardNegSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  test("dedup_span_frac: planted truncated copies saturate at dup_frac 1.0") {
    val rows = run("dedup_span_frac")
      .select("doc_id", "n_grams", "n_dup", "dup_frac", "verdict")
      .as[(Long, Long, Long, Double, String)].collect()
    spark.catalog.clearCache()

    // exactly one row per augmented doc (originals + every-10th copies)
    val ids = rows.map(_._1)
    assert(ids.distinct.length === ids.length)
    val nOrig = Tables.load(spark, dir, "documents").count()
    val nCopies = ids.count(_ >= DedupOps.AugBase)
    assert(ids.length.toLong === nOrig + nCopies && nCopies > 0)

    rows.foreach { case (id, nGrams, nDup, frac, verdict) =>
      assert(nDup >= 0 && nDup <= nGrams, s"doc $id: n_dup out of range")
      assert(frac >= 0.0 && frac <= 1.0, s"doc $id: dup_frac out of range")
      if (nGrams == 0) assert(verdict === "keep", s"doc $id: gram-less doc must keep")
      else assert(verdict === (if (frac >= 0.5) "flag" else "keep"), s"doc $id")
    }

    // a 4/5-truncated copy's distinct 5-gram set is a SUBSET of its
    // source's, so every gram it has occurs in >= 2 docs: dup_frac = 1
    val copies = rows.filter(r => r._1 >= DedupOps.AugBase && r._2 > 0)
    assert(copies.nonEmpty)
    copies.foreach { case (id, _, _, frac, verdict) =>
      assert(frac === 1.0, s"copy $id: expected saturated dup_frac, got $frac")
      assert(verdict === "flag", s"copy $id")
    }
    // and their sources are flagged too (they share >= 1/2 of their
    // grams with the copy at 4/5 truncation on this fixture)
    val flaggedSources = copies.map(_._1 - DedupOps.AugBase).toSet
    rows.filter(r => flaggedSources(r._1)).foreach { case (id, _, _, frac, _) =>
      assert(frac > 0.0, s"source $id of a planted copy has no duplicated spans")
    }
  }

  test("spanFracOver equals brute force on random small-vocab corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    // small vocab + short docs force heavy cross-doc 5-gram collisions
    val vocab = Vector("a", "b", "c", "d")
    val corpus = (1L to 60L).map { id =>
      val n = 3 + rnd.nextInt(10) // some docs below the 5-token floor
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }

    def brute(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
      val sets = docs.map { case (id, tx) =>
        val t = tx.split(" ")
        id -> (if (t.length < 5) Set.empty[String]
               else t.sliding(5).map(_.mkString(" ")).toSet)
      }.toMap
      sets.map { case (id, gs) =>
        val dup = gs.count(g => sets.exists { case (o, og) => o != id && og(g) })
        id -> (gs.size.toLong, dup.toLong)
      }
    }

    val got = DedupOps.spanFracOver(corpus.toDF("doc_id", "text"))
      .select("doc_id", "n_grams", "n_dup", "dup_frac", "verdict")
      .as[(Long, Long, Long, Double, String)].collect()
    spark.catalog.clearCache()
    val want = brute(corpus)

    assert(got.length === corpus.length)
    got.foreach { case (id, nGrams, nDup, frac, verdict) =>
      val (wGrams, wDup) = want(id)
      assert(nGrams === wGrams, s"doc $id n_grams")
      assert(nDup === wDup, s"doc $id n_dup")
      val wFrac = if (wGrams == 0) 0.0 else wDup.toDouble / wGrams
      assert(frac === wFrac, s"doc $id dup_frac")
      assert(verdict === (if (wGrams > 0 && wFrac >= 0.5) "flag" else "keep"), s"doc $id")
    }
  }

  test("sim_hard_negatives: negatives are other-label, ranked, semi-hard consistent") {
    val rows = run("sim_hard_negatives")
      .select("q_id", "q_label", "vec_id", "neg_label", "score", "pos_score",
        "semi_hard", "rk")
      .as[(Long, Int, Long, Int, Double, Double, Long, Long)].collect()
    spark.catalog.clearCache()

    assert(rows.nonEmpty)
    rows.foreach { case (q, ql, v, nl, score, pos, semi, rk) =>
      assert(nl !== ql, s"q $q: vec $v has the anchor's own label")
      assert(v !== q, s"q $q: anchor returned as its own negative")
      assert(rk >= 1 && rk <= 3, s"q $q: rank $rk out of band")
      assert(score <= 1.0 + 1e-9 && score >= -1.0 - 1e-9, s"q $q: cosine $score")
      assert(semi === (if (score < pos) 1L else 0L),
        s"q $q vec $v: semi_hard flag disagrees with score $score vs pos $pos")
    }
    // exactly 3 negatives per anchor, scores non-increasing in rank
    rows.groupBy(_._1).foreach { case (q, grp) =>
      assert(grp.length === 3, s"q $q: expected top-3")
      val byRk = grp.sortBy(_._8).map(_._5)
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a >= b },
        s"q $q: scores not non-increasing in rank")
      // pos_score is one per-anchor scalar
      assert(grp.map(_._6).distinct.length === 1, s"q $q: pos_score not constant")
    }
  }
}
