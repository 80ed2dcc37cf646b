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

  test("upsert rewrites only the delta's cells; untouched cell files survive verbatim") {
    val root = s"${ops.Staging.dir(dir)}/sim_index_upsert"
    ops.SimilarityOps.buildIvfIndex(spark, dir, root, !ops.SimilarityOps.upsertDelta)

    def snapshot(): Map[String, Seq[(String, Long)]] = {
      val post = new java.io.File(s"$root/postings.parquet")
      Option(post.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("c_id="))
        .map(d => d.getName -> d.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length())).sortBy(_._1).toSeq)
        .toMap
    }
    val before = snapshot()
    assert(before.nonEmpty)

    ops.SimilarityOps.upsertIvfIndex(spark, dir, root, ops.SimilarityOps.upsertDelta)
    val after = snapshot()

    // the cells the delta actually landed in, read back from the index
    val touched = spark.read.parquet(s"$root/postings.parquet")
      .filter(ops.SimilarityOps.upsertDelta)
      .select("c_id").distinct().collect().map(r => s"c_id=${r.get(0)}").toSet
    assert(touched.nonEmpty, "delta landed in no cell — fixture drift?")
    assert(touched.size < after.size,
      "delta touched every cell — shrink the delta slice so the untouched-cell " +
        "assertion is non-vacuous")

    after.keys.filterNot(touched).foreach { cell =>
      assert(after(cell) === before.getOrElse(cell, Seq.empty),
        s"untouched $cell was rewritten by the upsert")
    }
    touched.foreach { cell =>
      assert(after.get(cell) !== before.get(cell),
        s"touched $cell kept its exact files — dynamic overwrite did not engage")
    }

    // content contract: upserted index == base + delta, each vector once
    val postings = spark.read.parquet(s"$root/postings.parquet")
    val nVec = Tables.load(spark, dir, "embeddings").count()
    assert(postings.count() === nVec)
    assert(postings.select("vec_id").distinct().count() === nVec)
  }

  test("upsert is keyed: re-delivering the same delta converges, no duplicates") {
    val root = s"${ops.Staging.dir(dir)}/sim_index_upsert"
    ops.SimilarityOps.buildIvfIndex(spark, dir, root, !ops.SimilarityOps.upsertDelta)
    ops.SimilarityOps.upsertIvfIndex(spark, dir, root, ops.SimilarityOps.upsertDelta)
    val once = spark.read.parquet(s"$root/postings.parquet")
      .collect().map(_.toString).sorted
    // the at-least-once delivery case: the SAME batch arrives again
    ops.SimilarityOps.upsertIvfIndex(spark, dir, root, ops.SimilarityOps.upsertDelta)
    val twice = spark.read.parquet(s"$root/postings.parquet")
      .collect().map(_.toString).sorted
    assert(twice === once, "second delivery of the same delta changed the index")
    val nVec = Tables.load(spark, dir, "embeddings").count()
    assert(twice.length === nVec.toInt)
  }

  test("ensureBaseIvfIndex builds once per fixture fingerprint, rebuilds on marker loss") {
    val root = s"${ops.Staging.dir(dir)}/sim_index_ensure_test"
    val pred = !ops.SimilarityOps.upsertDelta
    def centMtimes(): Seq[Long] = {
      val d = new java.io.File(s"$root/centroids.parquet")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).map(_.lastModified).sorted.toSeq
    }
    ops.SimilarityOps.ensureBaseIvfIndex(spark, dir, root, pred)
    val built = centMtimes()
    assert(built.nonEmpty)
    ops.SimilarityOps.ensureBaseIvfIndex(spark, dir, root, pred)
    assert(centMtimes() === built, "matching fingerprint must skip the rebuild")
    // a lost/corrupt marker (crash between build and marker) must rebuild
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_staged_fingerprint"), "stale".getBytes)
    Thread.sleep(1100) // mtime granularity can be 1s on some filesystems
    ops.SimilarityOps.ensureBaseIvfIndex(spark, dir, root, pred)
    assert(centMtimes() !== built, "stale fingerprint must force a rebuild")
  }

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
