package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Throwaway stage-timing probe (not part of the library surface). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val p = 3; val q = 5

    // cumulative pipeline cuts; each built fresh (own persist) so the
    // delta between consecutive warm runs isolates a stage's warm cost
    def ssRel() = graft.ops.DedupOps.shingleSets(
      Tables.load(spark, dir, "documents")).persist()
    def shOf(ss: DataFrame) =
      ss.select(col("doc_id"), explode(col("shingles")).as("tok"))
    def trOf(ss: DataFrame) = shOf(ss).groupBy("tok")
      .agg(count(lit(1)).as("df"), collect_list(col("doc_id")).as("docs"))
      .select(col("tok"), col("df"), explode(col("docs")).as("doc_id"))
    def rankedOf(ss: DataFrame) = trOf(ss).groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("rt"))
      .withColumn("n", size(col("rt")).cast(LongType))
    def preOf(ss: DataFrame) = rankedOf(ss)
      .select(col("doc_id"), col("n"),
        posexplode(expr(s"slice(rt, 1, cast(n - ($p * n + ${q - 1}) div $q + 1 as int))"))
          .as(Seq("pi", "p")))
      .select(col("doc_id"), col("p.tok").as("tok"),
        (col("pi") + 1).cast(LongType).as("pos"), col("n"))
    def candOf(ss: DataFrame) = {
      val pre = preOf(ss)
      pre.select(col("doc_id").as("doc_a"), col("tok"),
          col("pos").as("pos_a"), col("n").as("n_a"))
        .join(pre.select(col("doc_id").as("doc_b"), col("tok"),
          col("pos").as("pos_b"), col("n").as("n_b")), Seq("tok"))
        .filter(col("doc_a") < col("doc_b") &&
          lit(q) * col("n_a") >= lit(p) * col("n_b") &&
          lit(q) * col("n_b") >= lit(p) * col("n_a") &&
          lit(1) + least(col("n_a") - col("pos_a"), col("n_b") - col("pos_b")) >=
            expr(s"($p * (n_a + n_b) + ${p + q - 1}) div ${p + q}"))
        .select("doc_a", "doc_b", "n_a", "n_b")
        .distinct()
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val cuts: Seq[(String, () => Unit)] = Seq(
      "1 ss" -> (() => { val ss = ssRel(); noop(ss); ss.unpersist() }),
      "2 tr" -> (() => { val ss = ssRel(); noop(trOf(ss)); ss.unpersist() }),
      "3 ranked" -> (() => { val ss = ssRel(); noop(rankedOf(ss)); ss.unpersist() }),
      "4 pre" -> (() => { val ss = ssRel(); noop(preOf(ss)); ss.unpersist() }),
      "5 cand" -> (() => { val ss = ssRel(); noop(candOf(ss)); ss.unpersist() }),
      "6 full" -> (() => {
        noop(graft.ops.DedupOps.allPairsOverSets(ssRel(), p, q))
        spark.catalog.clearCache()
      }))
    // pass 1 = cold (codegen etc.), pass 2 = warm
    (1 to 2).foreach { pass =>
      cuts.foreach { case (label, f) => t(s"pass$pass $label")(f()) }
    }
    spark.stop()
  }
}
