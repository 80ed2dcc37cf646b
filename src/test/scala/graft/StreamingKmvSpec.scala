package graft

import graft.streaming.StatefulOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The streaming KMV monitor must reproduce the batch sketch exactly:
  * the final (n_k, kth) snapshot per group, pushed through the batch
  * query's own (k-1)·M/kth arithmetic, equals the oracle-verified
  * q_sketch_kmv estimate double-for-double — and the sketch must
  * survive trigger splits (set-union folding is order-insensitive).
  */
class StreamingKmvSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val K = 64

  /** Deterministic snapshot collapse: n_k is monotone non-decreasing
    * across triggers, and among max-n_k emissions kth only improves.
    */
  private def finalSnapshots(table: String): Map[String, (Long, Long)] =
    spark.table(table)
      .select("group", "n_k", "kth").as[(String, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (g, snaps) =>
        val nMax = snaps.map(_._2).max
        g -> ((nMax, snaps.filter(_._2 == nMax).map(_._3).min))
      }

  test("kmvMonitor final snapshot estimate == batch q_sketch_kmv") {
    val staged = Files.createTempDirectory("graft-kmv-staged").toString
    Tables.load(spark, dir, "events")
      .select(col("event_type"), col("user_id").cast("string").as("k"))
      .write.mode("overwrite").parquet(staged)
    val stream = spark.readStream
      .schema(spark.read.parquet(staged).schema).parquet(staged)
      .as[(String, String)]
    val q = StatefulOps.kmvMonitor(stream, K)
      .writeStream.format("memory").queryName("kmv_snapshots")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "streaming query timed out")
    val got = finalSnapshots("kmv_snapshots").map { case (g, (nK, kth)) =>
      val est =
        if (nK < K) nK.toDouble
        else (K - 1).toDouble * 1.152921504606846976e18 / kth
      g -> est
    }
    val want = SparkEntry.queries("q_sketch_kmv")(spark, dir)
      .select("event_type", "kmv_est").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("kmv_est"))
      .toMap
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("kmvMonitor sketch survives trigger splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val members = (1 to 40).map(i => ("g", s"m$i"))
    val ms = MemoryStream[(String, String)]
    val q = StatefulOps.kmvMonitor(ms.toDS(), k = 16)
      .writeStream.format("memory").queryName("split_kmv")
      .outputMode("append").start()
    try {
      val (first, second) = members.splitAt(25)
      ms.addData(first: _*)
      q.processAllAvailable()
      // overlap: re-deliver five of the first batch — idempotent fold
      ms.addData(second ++ first.take(5): _*)
      q.processAllAvailable()
      val (nK, kth) = finalSnapshots("split_kmv")("g")
      // replay: k smallest distinct hashes of the whole member set
      val all = members.map(m => Cols.hex60Scalar(m._2)).distinct.sorted.take(16)
      assert(nK === all.size.toLong)
      assert(kth === all.last)
    } finally q.stop()
  }
}
