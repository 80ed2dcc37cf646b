package graft

import graft.ops.DedupOps
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property pin for the exact All-Pairs/PPJoin join: at EVERY rational
  * threshold p/q the prefix-filtered join must equal the brute-force
  * all-pairs similarity join — the prefix filter (rarest
  * n - ceil(p·n/q) + 1 tokens) and the length filter (q·min >= p·max)
  * are candidate PRUNERS only, so exactness (zero false negatives) is
  * the whole point of the operator (Bayardo et al. WWW 2007). Random
  * small-vocab corpora force heavy shingle collisions, near-threshold
  * Jaccards, and identical-doc pairs; the seed is fixed so failures
  * reproduce.
  */
class AllPairsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def shingleSet(text: String): Set[String] = {
    val t = text.split(" ")
    if (t.length < 3) Set.empty
    else t.sliding(3).map(_.mkString(" ")).toSet
  }

  /** Brute force over every pair: (doc_a, doc_b, n_a, n_b, n_inter)
    * for pairs with q·inter >= p·union, doc_a < doc_b.
    */
  private def bruteForce(
      docs: Seq[(Long, String)], p: Int, q: Int): Set[(Long, Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, tx) => id -> shingleSet(tx) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets
      (ib, sb) <- sets
      if ia < ib
      inter = (sa & sb).size
      union = sa.size + sb.size - inter
      if q * inter >= p * union
    } yield (ia, ib, sa.size.toLong, sb.size.toLong, inter.toLong)).toSet
  }

  private def corpus(r: Random, nDocs: Int): Seq[(Long, String)] = {
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    (0 until nDocs).map { i =>
      // lengths 1..20: include docs below the 3-token shingle cutoff
      val len = 1 + r.nextInt(20)
      val base = Seq.fill(len)(vocab(r.nextInt(vocab.size))).mkString(" ")
      (i.toLong, base)
    } ++ Seq(
      // planted identical pair (J = 1) and a planted truncation
      (nDocs.toLong, "ant bee cat dog elk fox gnu hen ant bee"),
      (nDocs + 1L, "ant bee cat dog elk fox gnu hen ant bee"),
      (nDocs + 2L, "ant bee cat dog elk fox gnu hen"))
  }

  private def run(docs: Seq[(Long, String)], p: Int, q: Int) = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    DedupOps.allPairsOver(df, p, q)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
  }

  test("prefix-filtered join equals brute force across thresholds and seeds") {
    val thresholds = Seq((1, 2), (3, 5), (4, 5))
    (1 to 3).foreach { seed =>
      val docs = corpus(new Random(seed), 30)
      thresholds.foreach { case (p, q) =>
        val expected = bruteForce(docs, p, q)
        val got = run(docs, p, q)
        assert(got == expected,
          s"seed=$seed p/q=$p/$q: missing=${expected -- got} extra=${got -- expected}")
        // the planted identical pair must always survive any threshold
        assert(got.exists { case (a, b, _, _, _) => a == 30L && b == 31L },
          s"seed=$seed p/q=$p/$q: planted identical pair missing")
      }
    }
  }

  test("tighter thresholds keep subsets of looser ones") {
    val docs = corpus(new Random(7), 30)
    val loose = run(docs, 1, 2).map { case (a, b, _, _, _) => (a, b) }
    val tight = run(docs, 4, 5).map { case (a, b, _, _, _) => (a, b) }
    assert(tight.subsetOf(loose), s"non-monotone: ${tight -- loose}")
  }
}
