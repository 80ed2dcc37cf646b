package graft

import graft.streaming.StatefulOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The streaming HLL monitor must reproduce the batch sketch exactly:
  * registers equal a driver-side replay of the shared register
  * function, and the estimate recomputed from the streamed registers
  * (exact integer harmonic sum, one correctly-rounded cast) equals the
  * oracle-verified q_sketch_hll output double-for-double.
  */
class StreamingHllSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val staged: String = {
    val d = Files.createTempDirectory("graft-hll-staged").toString
    Tables.load(spark, dir, "events")
      .select(col("event_type"), col("user_id").cast("string").as("k"))
      .write.mode("overwrite").parquet(d)
    d
  }

  test("hllMonitor registers == batch registers, estimate == q_sketch_hll") {
    val stream = spark.readStream
      .schema(spark.read.parquet(staged).schema).parquet(staged)
      .as[(String, String)]
    val q = StatefulOps.hllMonitor(stream)
      .writeStream.format("memory").queryName("hll_registers")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "streaming query timed out")
    // one available-now batch -> one emission per touched register; a
    // max() collapse keeps the assertion valid for any trigger split
    val got = spark.table("hll_registers")
      .groupBy("group", "bucket").agg(max("mj").as("mj"))
      .collect()
      .map(r => (r.getAs[String]("group"), r.getAs[Long]("bucket")) -> r.getAs[Long]("mj"))
      .toMap

    // driver-side replay of the SAME register function
    val want = spark.read.parquet(staged).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("k")))
      .groupBy { case (g, k) => (g, StatefulOps.hllRegister(k)._1) }
      .map { case ((g, b), xs) =>
        (g, b) -> xs.map(x => StatefulOps.hllRegister(x._2)._2).max }
    assert(got === want)

    // estimate from the streamed registers: exact integer harmonic sum,
    // then the identical fixed double sequence the query uses
    val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    val byGroup = got.groupBy(_._1._1)
    val batch = SparkEntry.queries("q_sketch_hll")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("hll_est"), r.getAs[Long]("n_empty"))).toMap
    byGroup.foreach { case (g, regs) =>
      val sigmaInt = regs.values.map(mj => BigInt(1) << (60 - mj.toInt)).sum +
        BigInt(256 - regs.size) * (BigInt(1) << 60)
      val sigma = new java.math.BigDecimal(sigmaInt.bigInteger).doubleValue
      val est = alpha * 65536.0 * 1.152921504606846976e18 / sigma
      val (wantEst, wantEmpty) = batch(g)
      assert(est === wantEst, s"$g: streamed-register estimate drifted")
      assert(256L - regs.size === wantEmpty)
    }
    spark.catalog.clearCache()
  }
}
