package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Stream-stream interval join — the hardest Structured Streaming
  * surface: both sides are unbounded, so each needs a watermark and the
  * join condition needs event-time bounds for Spark to know when state
  * on either side can be evicted. Asserted equal to the identical batch
  * join over the same data (an available-now run never evicts state
  * prematurely, so the streaming result must be complete).
  */
class StreamStreamJoinSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val staged: String = {
    val dir = Files.createTempDirectory("graft-ss-join").toString
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def clicks(df: DataFrame): DataFrame =
    df.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))

  private def purchases(df: DataFrame): DataFrame =
    df.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))

  private def joined(c: DataFrame, p: DataFrame): DataFrame =
    c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") - expr("INTERVAL 1 HOUR") &&
        col("p_ts") <= col("c_ts"))
      .select(col("click_id"), col("purchase_id"), col("c_ts"), col("p_ts"))

  test("stream-stream interval join == batch join") {
    val batch = spark.read.parquet(staged)
    val stream = spark.readStream.schema(batch.schema).parquet(staged)
    val q = joined(
      clicks(stream).withWatermark("c_ts", "2 hours"),
      purchases(stream).withWatermark("p_ts", "2 hours"))
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "streaming query timed out")
    val got = spark.table("ss_join").collect().map(_.toString).sorted
    val want = joined(clicks(batch), purchases(batch))
      .collect().map(_.toString).sorted
    assert(got.nonEmpty, "join produced no rows — vacuous")
    assert(got === want)
  }
}
