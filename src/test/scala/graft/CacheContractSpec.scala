package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registry caching contract (SparkEntry.queries scaladoc) says
  * callers SHOULD clearCache between queries to bound memory — but
  * accumulated cache must never change ANSWERS, only footprint. This
  * spec runs persisting queries back-to-back WITHOUT clearCache and
  * asserts their results match fresh-cache runs: a stale cache entry
  * being picked up by plan-fragment matching (Spark's cache manager
  * substitutes any sameResult subtree) must substitute VALUES
  * identical to a recompute.
  */
class CacheContractSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  // two queries that persist internal relations over the SAME corpus
  // (shingle sets / band keys), so the second run really does hit the
  // first's surviving cache fragments where plans coincide
  private val persistingPair = Seq("dedup_minhash_lsh", "dedup_near_components")

  private def run(name: String): Set[Seq[Any]] =
    SparkEntry.queries(name)(spark, dir).collect().map(_.toSeq).toSet

  test("back-to-back persisting queries without clearCache match fresh runs") {
    // fresh-cache reference answers
    val reference = persistingPair.map { n =>
      spark.catalog.clearCache()
      n -> run(n)
    }
    spark.catalog.clearCache()

    // contract exercise: no clearCache anywhere in this block
    val dirty = persistingPair.map(n => n -> run(n))
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "the pair should have left cache behind — otherwise this spec " +
        "isn't exercising the accumulation path")
    // and once more in reverse order, against the now-accumulated cache
    val dirtyReversed = persistingPair.reverse.map(n => n -> run(n))

    spark.catalog.clearCache()
    (dirty ++ dirtyReversed).foreach { case (n, got) =>
      val want = reference.find(_._1 == n).get._2
      assert(got === want,
        s"$n answered differently under accumulated cache")
    }
  }
}
