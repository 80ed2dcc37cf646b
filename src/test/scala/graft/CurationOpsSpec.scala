package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the round-5 curation/ANN operators — the
  * properties a consumer relies on that the row-hash oracle compare
  * does not state explicitly (contiguity, bounds, quota respect).
  */
class CurationOpsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  test("text_shuffle_shard: every shard's ordinals are contiguous from 1") {
    val rows = run("text_shuffle_shard")
      .select("shard", "ordinal").as[(Long, Long)].collect()
    val total = Tables.load(spark, dir, "documents").count()
    assert(rows.length.toLong === total) // every doc lands in a shard
    val byShard = rows.groupBy(_._1)
    assert(byShard.keySet.forall(s => s >= 0 && s < graft.ops.TextOps.NumShards))
    byShard.foreach { case (shard, grp) =>
      val ords = grp.map(_._2).sorted.toSeq
      assert(ords === (1L to grp.length.toLong).toSeq,
        s"shard $shard ordinals not contiguous")
    }
  }

  test("sim_pq_codes: one code per (vector, subspace), codes within codebook") {
    val rows = run("sim_pq_codes")
      .select("vec_id", "m", "code").as[(Long, Long, Long)].collect()
    val nVec = Tables.load(spark, dir, "embeddings").count()
    assert(rows.length.toLong === nVec * 4) // PqM subspaces each
    assert(rows.forall { case (_, m, c) => m >= 0 && m < 4 && c >= 0 && c < 4 })
    // exactly one code per (vec, m)
    assert(rows.map(r => (r._1, r._2)).distinct.length === rows.length)
  }

  // The SemDeDup adaptive-k contract (the round-13 sf10 quadratic fix):
  // below 8·SemClusterTarget vectors the floor keeps the original
  // 8-centroid layout — the property that held the sf0.01 gate results
  // bit-stable across the fix — and past that knee k grows with the
  // corpus (k = N/1024), which is what bounds the within-cluster
  // all-pairs volume to ~1024·N instead of N²/8.
  test("semClusteredVectors: k floors at 8 on the fixture, scales past the knee") {
    import org.apache.spark.sql.functions.{col, expr, lit}
    val fx = graft.ops.SimilarityOps.semClusteredVectors(spark, dir)
      .select("vec_id", "c_id").as[(Long, Long)].collect().toSet
    val base = graft.ops.SimilarityOps.clusteredVectors(spark, dir)
      .select("vec_id", "c_id").as[(Long, Long)].collect().toSet
    assert(fx === base,
      "below the knee the adaptive k must reproduce the 8-centroid assignment")

    val n = 16384L // 16·SemClusterTarget -> k must be 16
    val tmpPath = java.nio.file.Files.createTempDirectory("graft-semk")
    val tmp = tmpPath.toString
    try {
      spark.range(n).select(col("id").as("vec_id"),
          expr("transform(sequence(0, 63), " +
            "j -> CAST(((id*31 + j*7) % 97 - 48) / 48.0 AS FLOAT))").as("embedding"),
          lit("x").as("label"))
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
      val big = graft.ops.SimilarityOps.semClusteredVectors(spark, tmp)
        .select("vec_id", "c_id").as[(Long, Long)].collect()
      assert(big.length.toLong === n) // every vector assigned exactly once
      assert(big.map(_._1).distinct.length.toLong === n)
      val cIds = big.map(_._2).distinct.sorted.toSeq
      assert(cIds === (0L until 16L).toSeq,
        s"expected the 16 seed centroids past the knee, got $cIds")
    } finally {
      // the multi-MB fixture must not leak a temp tree per suite run
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmpPath).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  // Guards the two-pass argmax's bitwise-equality assumption
  // (SimilarityOps.assignSem pass 2 keeps rows via score === best_cos
  // across two executions of the same codegen'd expression): with ALL
  // EIGHT seed centroids identical, every vector has 8 bitwise-tied
  // max achievers — the worst case for the re-score filter. Every
  // vector must still be assigned exactly once, to the min c_id. A
  // future Spark change that broke exact re-evaluation would drop
  // vectors here (and trip the semClusteredVectors require) long
  // before it corrupted a real corpus.
  test("semClusteredVectors: duplicate-max centroids — every vector assigned once, min c_id wins") {
    import org.apache.spark.sql.functions.{col, expr, lit, when}
    val tmpPath = java.nio.file.Files.createTempDirectory("graft-semtie")
    val tmp = tmpPath.toString
    try {
      // vec_id 0..7 (the seed centroids) share ONE embedding; the rest
      // vary — so all 8 centroid scores tie bitwise for every vector
      spark.range(64).select(col("id").as("vec_id"),
          when(col("id") < 8,
            expr("transform(sequence(0, 63), j -> CAST(j + 1 AS FLOAT))"))
            .otherwise(expr("transform(sequence(0, 63), " +
              "j -> CAST(((id*31 + j*7) % 97 - 48) / 48.0 AS FLOAT))"))
            .as("embedding"),
          lit("x").as("label"))
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
      val cl = graft.ops.SimilarityOps.semClusteredVectors(spark, tmp)
        .select("vec_id", "c_id").as[(Long, Long)].collect()
      assert(cl.length === 64, "totality: every vector assigned")
      assert(cl.map(_._1).distinct.length === 64, "exactly once each")
      assert(cl.forall(_._2 === 0L),
        "8-way bitwise tie must break to the smallest c_id")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmpPath).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  // The hierarchical assignment's degenerate-case contract: below the
  // adaptive knee kc = k = 8, so fine == coarse centroid sets, each
  // fine centroid routes to itself (cosine exactly 1), and a vector's
  // within-cell candidate list is exactly its coarse argmax — the
  // hierarchical assignment must REPRODUCE the flat one bit-for-bit.
  // Past the knee it is a genuine approximation (only within-cell
  // optimality holds, certified by the registry oracle row); here we
  // pin totality and that every assigned cell is a seed fine centroid.
  test("semHierClusteredVectors: equals flat below the knee, total past it") {
    import org.apache.spark.sql.functions.{col, expr, lit}
    val hier = graft.ops.SimilarityOps.semHierClusteredVectors(spark, dir)
      .select("vec_id", "c_id").as[(Long, Long)].collect().toSet
    val flat = graft.ops.SimilarityOps.semClusteredVectors(spark, dir)
      .select("vec_id", "c_id").as[(Long, Long)].collect().toSet
    assert(hier === flat,
      "below the knee the two-level routing must reproduce the flat assignment")

    val n = 16384L // 16·SemClusterTarget -> k = 16, kc = 8: a real 2-level split
    val tmpPath = java.nio.file.Files.createTempDirectory("graft-semhier")
    val tmp = tmpPath.toString
    try {
      spark.range(n).select(col("id").as("vec_id"),
          expr("transform(sequence(0, 63), " +
            "j -> CAST(((id*31 + j*7) % 97 - 48) / 48.0 AS FLOAT))").as("embedding"),
          lit("x").as("label"))
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
      val big = graft.ops.SimilarityOps.semHierClusteredVectors(spark, tmp)
        .select("vec_id", "c_id").as[(Long, Long)].collect()
      assert(big.length.toLong === n, "totality: every vector assigned")
      assert(big.map(_._1).distinct.length.toLong === n, "exactly once each")
      assert(big.forall(_._2 < 16L),
        "every assignment lands on one of the 16 seed fine centroids")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmpPath).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("dedup_semantic: verdict covers the corpus and both classes occur") {
    val rows = run("dedup_semantic")
      .select("vec_id", "kept").as[(Long, Long)].collect()
    val nVec = Tables.load(spark, dir, "embeddings").count()
    assert(rows.length.toLong === nVec)
    val kept = rows.count(_._2 == 1L)
    assert(kept > 0 && kept < rows.length,
      s"degenerate verdict: $kept kept of ${rows.length}")
  }

  test("q_source_cap: no source exceeds its quota") {
    val bySource = run("q_source_cap")
      .select("source").as[String].collect().groupBy(identity)
    assert(bySource.nonEmpty)
    assert(bySource.values.forall(_.length <= graft.ops.TextOps.SourceCap))
  }

  test("text_decontam_bloom: the screen is one-sided (no false negatives)") {
    val rows = run("text_decontam_bloom")
      .select("n_maybe", "n_exact").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // a Bloom filter may over-approximate, never under-approximate
    assert(rows.forall { case (maybe, exact) => maybe >= exact })
  }

  test("q_sketch_kmv_ops: estimates respect set algebra and stay near exact") {
    val rows = run("q_sketch_kmv_ops")
      .select("exact_union", "exact_inter", "est_union", "est_inter")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exU, exI, esU, esI) =>
      assert(exI <= exU && esI <= esU + 1e-9)
      // k=64 KMV: loose 3x envelope — catches broken arithmetic, not variance
      assert(esU > exU / 3.0 && esU < exU * 3.0)
    }
  }

  test("q_dsir_weights: weights are mean ratios, so within [0, 1]") {
    val rows = run("q_dsir_weights")
      .select("n_tokens", "weight").as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (n, w) => n > 0 && w >= 0.0 && w <= 1.0 })
  }
}
