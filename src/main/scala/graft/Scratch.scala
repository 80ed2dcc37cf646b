package graft
import org.apache.spark.sql.SparkSession

/** Plan-inspection development tool: warms the session, optionally
  * dumps `explain("formatted")` (set SCRATCH_EXPLAIN=1), and prints the
  * warm execution time of one registered query. Not part of the
  * library surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like Bench/Verify: a timestamp-bearing fixture read through
      // this main must decode identically to the oracle on any host
      .config("spark.sql.session.timeZone", "UTC")
      // AQE may re-coalesce cached-plan output partitioning (see Bench)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SCRATCH_LOGLEVEL", "WARN"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      // warm the session so timings aren't init noise
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"warmup $name failed: ${e.getMessage}") }
      spark.catalog.clearCache()
      val df = SparkEntry.queries(name)(spark, dir)
      if (sys.env.contains("SCRATCH_EXPLAIN")) df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"ELAPSED $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
