package graft

import org.scalatest.funsuite.AnyFunSuite

/** The sliced certification twins must reproduce their registry rows
  * EXACTLY — the whole point of the protocol is that the DuckDB oracle
  * replayed against a sliced run certifies the registry relation. The
  * slice count deliberately does not divide anything evenly here
  * (3 slices over the fixture's key space) so partial-sum and
  * union-distinct identities are exercised across ragged slices.
  */
class SlicedExecSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  private def tmpScratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-sliced-$tag").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("shingleCosineSliced reproduces dedup_shingle_cosine bit-for-bit") {
    val full = SparkEntry.queries("dedup_shingle_cosine")(spark, dir)
    val scratch = tmpScratch("cos")
    try {
      val sliced = ops.DedupOps.shingleCosineSliced(spark, dir, 3, s"$scratch/p")
      assert(rows(sliced) === rows(full))
    } finally spark.catalog.clearCache()
  }

  test("allPairsSliced reproduces allPairsOver bit-for-bit") {
    val docs = Tables.load(spark, dir, "documents")
    val full = ops.DedupOps.allPairsOver(docs, 3, 5)
    val scratch = tmpScratch("ap")
    try {
      val sliced = ops.DedupOps.allPairsSliced(spark, docs, 3, 5, 3, s"$scratch/p")
      assert(rows(sliced) === rows(full))
    } finally spark.catalog.clearCache()
  }
}
