package graft

import graft.ops.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Alternating large-star/small-star connected components: agreement
  * with min-label propagation on propagation-friendly graphs, and
  * convergence on the long-chain graphs propagation cannot handle
  * (its rounds = graph diameter; the star contraction is O(log n)).
  */
class StarComponentsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction collapses a 200-node path in O(log n) rounds") {
    // diameter 199: min-label propagation's 20-round cap cannot label
    // this graph; the star algorithm must (and must label every node 0)
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val got = labels(DedupOps.connectedComponentsStar(chain))
    assert(got.size == 200)
    assert(got.values.forall(_ == 0L))
  }

  test("star and propagation agree on a multi-component random graph") {
    // three dense clusters with distinct minima + shared randomness so
    // the test is deterministic
    val rnd = new scala.util.Random(42)
    val edges = (0 until 3).flatMap { c =>
      val base = c * 1000L
      (1 to 60).map { _ =>
        (base + rnd.nextInt(30), base + rnd.nextInt(30))
      }.filter { case (a, b) => a != b }
    }.toDF("a", "b")
    val star = labels(DedupOps.connectedComponentsStar(edges))
    val prop = labels(DedupOps.connectedComponents(edges))
    assert(star == prop)
    // the three 1000-spaced clusters can never merge with each other
    assert(star.values.toSet.size >= 3)
  }

  test("a 10^4-node path converges in O(log n) rounds, labeled 0") {
    // THE adversarial case for label propagation (rounds = diameter =
    // 9999); the star contraction's whole reason to exist is finishing
    // this in logarithmically many rounds. 2*log2(n) + 4 ≈ 30 is a
    // loose ceiling over the Kiveris et al. w.h.p. bound — a
    // regression to per-hop propagation (10^4 rounds) or any
    // super-logarithmic behavior fails immediately.
    val n = 10000L
    val chain = spark.range(n - 1).select(col("id").as("a"), (col("id") + 1).as("b"))
    val (df, rounds) = DedupOps.connectedComponentsStarWithRounds(chain)
    val got = labels(df)
    assert(got.size == n)
    assert(got.values.forall(_ == 0L))
    val bound = 2 * (math.log(n.toDouble) / math.log(2)).ceil.toInt + 4
    assert(rounds <= bound,
      s"star contraction took $rounds rounds on a ${n}-node path (bound $bound)")
  }

  test("an input that is already a disjoint min-star set converges in ONE round") {
    // the fixpoint probe recognizes star shape directly on the round's
    // output — it must not pay an extra confirmation round (the old
    // compute-and-compare probe always did)
    val stars = Seq((5L, 1L), (9L, 1L), (7L, 1L), (12L, 10L)).toDF("a", "b")
    val (df, rounds) = DedupOps.connectedComponentsStarWithRounds(stars)
    assert(rounds == 1, s"star-shaped input took $rounds rounds")
    val got = labels(df)
    assert(got == Map(5L -> 1L, 9L -> 1L, 7L -> 1L, 1L -> 1L,
      12L -> 10L, 10L -> 10L))
  }

  test("edgesDistinctCanonical=true equals the default path on a distinct strictly-oriented edge set") {
    // the minhash/simhash pair graphs are distinct with doc_a < doc_b
    // strictly — the flag skips the init dedup exchange; the fixpoint
    // must be identical edge for edge
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map { _ =>
      val a = rnd.nextInt(40).toLong; val b = a + 1 + rnd.nextInt(20)
      (a, b)
    }.distinct.toDF("a", "b") // distinct, a < b strictly
    val (fixDefault, _) = DedupOps.starFixpointEdges(edges)
    val (fixCanon, _) =
      DedupOps.starFixpointEdges(edges, edgesDistinctCanonical = true)
    assert(fixDefault.exceptAll(fixCanon).count() === 0L)
    assert(fixCanon.exceptAll(fixDefault).count() === 0L)
    // and the member map built on the flag matches the full labeling
    // contract for non-root members
    val full = labels(DedupOps.connectedComponentsStar(edges))
    val member = labels(DedupOps.starMemberMap(edges, edgesDistinctCanonical = true))
    member.foreach { case (d, c) => assert(full(d) == c) }
  }

  test("star labels isolated star centers as themselves") {
    val edges = Seq((5L, 9L), (9L, 7L), (100L, 101L)).toDF("a", "b")
    val got = labels(DedupOps.connectedComponentsStar(edges))
    assert(got == Map(5L -> 5L, 9L -> 5L, 7L -> 5L, 100L -> 100L, 101L -> 100L))
  }
}
