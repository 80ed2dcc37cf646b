package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{DimDrift, VecArrival}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The streaming drift monitor must reproduce the oracle-verified
  * batch `sim_dim_drift` exactly: integer cohort sums make the fold
  * commutative/associative, so the final per-dimension snapshot
  * equals the batch row double-for-double and survives trigger
  * splitting and replay order.
  */
class StreamingDriftSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Last snapshot per dim = the max-(n_a + n_b) emission. */
  private def finalSnapshots(table: String): Map[Long, (Long, Long, Double, Double, Double)] =
    spark.table(table).as[DimDrift].collect()
      .groupBy(_.dim)
      .map { case (d, snaps) =>
        val last = snaps.maxBy(s => s.n_a + s.n_b)
        d -> ((last.n_a, last.n_b, last.mean_a, last.mean_b, last.shift))
      }

  test("dimDriftMonitor final snapshot == batch sim_dim_drift") {
    val staged = Files.createTempDirectory("graft-drift-staged").toString
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .write.mode("overwrite").parquet(staged)
    val stream = spark.readStream
      .schema(spark.read.parquet(staged).schema).parquet(staged)
      .as[VecArrival]
    val q = StatefulOps.dimDriftMonitor(stream)
      .writeStream.format("memory").queryName("drift_snapshots")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "streaming query timed out")
    val got = finalSnapshots("drift_snapshots")
    val want = SparkEntry.queries("sim_dim_drift")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("dim") -> ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Double]("mean_a"), r.getAs[Double]("mean_b"),
        r.getAs[Double]("shift"))))
      .toMap
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("dimDriftMonitor state survives trigger splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vecs = (0L until 10L).map(i =>
      VecArrival(i, Seq(0.125 * i, -0.25 * i, 3.5)))
    val ms = MemoryStream[VecArrival]
    val q = StatefulOps.dimDriftMonitor(ms.toDS())
      .writeStream.format("memory").queryName("split_drift")
      .outputMode("append").start()
    try {
      val (first, second) = vecs.splitAt(7)
      ms.addData(first: _*)
      q.processAllAvailable()
      // second slice arrives REVERSED — integer sums don't care
      ms.addData(second.reverse: _*)
      q.processAllAvailable()
      val got = finalSnapshots("split_drift")
      // replay in plain Scala over the full set, one batch
      val want = (1 to 3).map { d =>
        val obs = vecs.map(v => (v.vec_id % 2, math.floor(v.emb(d - 1) * 1e9).toLong))
        val (a, b) = obs.partition(_._1 == 0L)
        val (na, nb) = (a.size.toLong, b.size.toLong)
        val (sa, sb) = (a.map(_._2).sum, b.map(_._2).sum)
        val (ma, mb) = (sa.toDouble / (na * 1e9), sb.toDouble / (nb * 1e9))
        d.toLong -> ((na, nb, ma, mb, mb - ma))
      }.toMap
      assert(got === want)
    } finally q.stop()
  }
}
