package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time window transforms, written once against the untyped
  * DataFrame API so the SAME plan runs in batch (graft.ops.EventOps
  * queries, oracle-checked) and in Structured Streaming
  * (readStream -> transform -> writeStream; asserted batch-equivalent
  * in StreamingEquivalenceSpec).
  *
  * This is the Spark-native property the reference (batch-only,
  * `main.tf:70-72` single concurrent run) cannot express: one
  * declarative plan, two execution modes. Streaming state scales
  * because every transform groups on (window, key) — state is
  * partitioned by the same keys the shuffle hashes on.
  */
object EventWindows {

  /** Epoch-aligned 1-hour tumbling windows per event type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.Cols.dsum(col("value")).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** 1-hour windows sliding every 15 minutes (each event in 4 windows). */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.Cols.dsum(col("value")).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** Gap-based session windows (30-minute inactivity gap) per user. */
  def session(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), graft.Cols.dsum(col("value")).as("total"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("total"))
}
