package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the persisted IVF index's on-disk contract: postings are laid
  * out hive-partitioned by cell (one directory per c_id), so a serving
  * job can read exactly the probed cell's files — the file-level
  * inverted file. The oracle compare proves the reloaded index serves
  * bit-identical results; this proves the layout that makes the
  * serving read O(cell) instead of O(corpus).
  */
class SimIndexSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("saved postings are cell-partitioned; every vector in exactly one cell") {
    val out = SparkEntry.queries("sim_index_roundtrip")(spark, dir)
    assert(out.count() > 0) // also materializes the index build
    spark.catalog.clearCache()

    val root = new java.io.File(
      s"${ops.Staging.dir(dir)}/sim_index/postings.parquet")
    val cellDirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("c_id="))
    assert(cellDirs.nonEmpty, s"no c_id= partition directories under $root")

    // reloading the layout restores the full corpus, one cell per vector
    val postings = spark.read.parquet(root.getPath)
    val nVec = Tables.load(spark, dir, "embeddings").count()
    assert(postings.count() === nVec)
    assert(postings.select("vec_id").distinct().count() === nVec)
    assert(postings.select("c_id").distinct().count() === cellDirs.length.toLong)
  }
}
