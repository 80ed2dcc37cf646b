package graft

import graft.ops.DedupOps
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property-style tests for the two connected-components
  * implementations: on seeded random graphs of varying shape both must
  * agree with a driver-side union-find ground truth (component label =
  * min node id, the documented contract), star must stay within its
  * O(log n) round bound, and min-label propagation is checked only on
  * graphs whose BFS diameter fits its round cap (its documented
  * domain — dedup graphs with short chains).
  */
class GraphPropertiesSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  /** Union-find ground truth: node -> min node id of its component. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // one more pass fully compresses every chain to its root, and the
    // union rule (bigger root points at smaller) makes root = min id
    parent.keys.toSeq.map(n => n -> find(n)).toMap
  }

  /** Max BFS eccentricity over all nodes — propagation needs rounds
    * >= diameter, so graphs past its 20-round cap are out of its
    * documented domain and only star is exercised on them.
    */
  private def diameter(edges: Seq[(Long, Long)]): Int = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2)
    val nodes = adj.keys.toSeq
    nodes.map { s =>
      var frontier = Set(s); var seen = Set(s); var d = 0
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj(_)).diff(seen)
        if (frontier.nonEmpty) { seen ++= frontier; d += 1 }
      }
      d
    }.max
  }

  private def spark2(edges: Seq[(Long, Long)], star: Boolean): Map[Long, Long] = {
    val df = edges.toDF("a", "b")
    val got =
      if (star) DedupOps.connectedComponentsStar(df)
      else DedupOps.connectedComponents(df)
    got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def shapes(seed: Int): Seq[(String, Seq[(Long, Long)])] = {
    val r = new Random(seed)
    val sparse = Seq.fill(50)((r.nextInt(60).toLong, r.nextInt(60).toLong))
    val clusters = (0 until 3).flatMap { c =>
      val base = c * 100L
      Seq.fill(25)((base + r.nextInt(12), base + r.nextInt(12)))
    }
    val chains = (0L until 30L).map(i => (i, i + 1)) ++
      (100L until 125L).map(i => (i, i + 1))
    val withNoise = sparse.map { case (a, b) => (a, b) } ++
      Seq((7L, 7L), (3L, 5L), (5L, 3L), (3L, 5L)) // self-loops + dups + swaps
    Seq("sparse" -> sparse, "clusters" -> clusters,
      "chains" -> chains, "noisy" -> withNoise)
  }

  test("star and propagation match union-find on seeded random graphs") {
    Seq(1, 42, 2026).foreach { seed =>
      shapes(seed).foreach { case (shape, raw) =>
        val edges = raw.filter { case (a, b) => a != b }
        if (edges.nonEmpty) {
          val want = unionFind(edges)
          withClue(s"seed=$seed shape=$shape star:") {
            assert(spark2(edges, star = true) === want)
          }
          if (diameter(edges) < 18) // propagation's documented domain
            withClue(s"seed=$seed shape=$shape propagation:") {
              assert(spark2(edges, star = false) === want)
            }
        }
      }
    }
  }

  test("star round count stays logarithmic on every seeded shape") {
    Seq(7, 99).foreach { seed =>
      shapes(seed).foreach { case (shape, raw) =>
        val edges = raw.filter { case (a, b) => a != b }
        if (edges.nonEmpty) {
          val n = edges.flatMap(e => Seq(e._1, e._2)).distinct.size
          val (_, rounds) = DedupOps.connectedComponentsStarWithRounds(
            edges.toDF("a", "b"))
          // Kiveris et al.: O(log n) w.h.p.; 2*log2(n)+4 is a generous
          // deterministic envelope that still catches a linear blowup
          val bound = 2 * (64 - java.lang.Long.numberOfLeadingZeros(n.toLong)) + 4
          withClue(s"seed=$seed shape=$shape n=$n rounds=$rounds:") {
            assert(rounds <= bound)
          }
        }
      }
    }
  }
}
