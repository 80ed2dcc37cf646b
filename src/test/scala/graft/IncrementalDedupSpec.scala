package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the round-4 dedup additions: the inverted-index
  * shingle-cosine join is checked against a driver-side brute-force
  * all-pairs computation (full equivalence at sf0.001 scale), and the
  * incremental-dedup gate against the semantics of its three planted
  * arrival kinds.
  */
class IncrementalDedupSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  /** Driver-side replica of the augmented corpus's shingle sets. */
  private def shingleSets(): Map[Long, Set[String]] = {
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def sh(text: String): Set[String] = {
      val t = text.split(" ", -1)
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    def trunc(text: String): String = {
      val t = text.split(" ", -1)
      val keep = math.max(1, math.floor(t.length * 4 / 5.0).toInt)
      t.take(keep).mkString(" ")
    }
    (base.map { case (id, tx) => id -> sh(tx) } ++
      base.collect { case (id, tx) if id % 10 == 0 =>
        (id + 10000000L) -> sh(trunc(tx)) }).toMap
  }

  test("dedup_shingle_cosine: equals brute-force all-pairs Ochiai over shingle sets") {
    val got = SparkEntry.queries("dedup_shingle_cosine")(spark, dir).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("cosine"))).toMap
    spark.catalog.clearCache()
    val sets = shingleSets().filter(_._2.nonEmpty)
    // fixture df never exceeds the cap, so brute force IS the expected
    // output (the cap is exercised as a no-op here; its arithmetic is
    // covered by the oracle twin carrying the same cap)
    val expected = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      c = (sa intersect sb).size if c > 0
      cos = c / math.sqrt(sa.size.toDouble * sb.size.toDouble) if cos >= 0.5
    } yield (a, b) -> cos).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) => assert(v === expected(k), s"cosine drift at $k") }
    // the planted 4/5 truncations dominate the result
    assert(got.keySet.count { case (a, b) => b == a + 10000000L } > 0)
  }

  test("dedup_triangles: stats match a brute-force count over the simhash pair graph") {
    // the query analyzes the DEPLOYMENT (corpus-adaptive) pair graph;
    // at fixture scale that is the 60-bit family, and the brute force
    // reads the same adaptive row so the truth tracks the selection
    val edges = SparkEntry.queries("dedup_simhash_auto")(spark, dir).collect()
      .filter(_.getAs[Long]("hamming") <= 1) // the query's own subgraph cut
      .map(r => (math.min(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        math.max(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))).toSet
    val row = SparkEntry.queries("dedup_triangles")(spark, dir).collect().head
    spark.catalog.clearCache()
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val adj = nodes.map(n => n ->
      edges.collect { case (a, b) if a == n => b; case (a, b) if b == n => a }).toMap
    val deg = adj.view.mapValues(_.size).toMap
    val wedges = deg.values.map(d => d.toLong * (d - 1) / 2).sum
    // adj(a).iterator, NOT adj(a): a Set generator would collapse the
    // yielded 1s per edge and count "edges in >=1 triangle" instead
    val triangles = (for {
      (a, b) <- edges.iterator
      c <- adj(a).iterator if c > b && edges.contains((b, c))
    } yield 1).size.toLong
    assert(row.getAs[Long]("n_nodes") === nodes.size.toLong)
    assert(row.getAs[Long]("n_edges") === edges.size.toLong)
    assert(row.getAs[Long]("n_wedges") === wedges)
    assert(row.getAs[Long]("n_triangles") === triangles)
    assert(row.getAs[Double]("clustering") === 3.0 * triangles / wedges)
  }

  test("dedup_incremental: planted arrival kinds route to the right decision") {
    val rows = SparkEntry.queries("dedup_incremental")(spark, dir).collect()
    spark.catalog.clearCache()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val nBase = Tables.load(spark, dir, "documents").count()
    // every incoming doc reported exactly once
    assert(rows.length === byId.size)
    assert(rows.length ===
      (0L until nBase).count(_ % 7 == 0) + (0L until nBase).count(_ % 10 == 0) +
        (0L until nBase).count(_ % 13 == 0))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val isExact = r.getAs[Boolean]("is_exact")
      val isNear = r.getAs[Boolean]("is_near")
      val decision = r.getAs[String]("decision")
      assert(decision === (if (isExact || isNear) "drop" else "keep"), s"doc $id")
      if (id >= 20000000L && id < 30000000L)
        assert(isExact, s"verbatim copy $id must be an exact dup")
      if (id >= 30000000L)
        assert(!isExact, s"token-reversed doc $id cannot be an exact dup")
    }
    // at least one truncation near-dup is caught, and at least one
    // reversed doc survives the gate
    assert(rows.exists(r => r.getAs[Long]("doc_id") >= 10000000L &&
      r.getAs[Long]("doc_id") < 20000000L && r.getAs[Boolean]("is_near")))
    assert(rows.exists(r => r.getAs[Long]("doc_id") >= 30000000L &&
      r.getAs[String]("decision") == "keep"))
  }
}
