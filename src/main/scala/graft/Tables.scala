package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-table loaders (TESTDATA.md). One parquet file per table under
  * the per-scale-factor dir the driver passes to every query.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize a parquet `ts` column to session-TZ TimestampType regardless
    * of how the fixture generator encoded it. Observed encodings across
    * driver regenerations:
    *   - TIMESTAMP(NANOS): Spark's reader rejects it; with
    *     `nanosAsLong` it arrives as LongType int64 nanos → divide to micros.
    *   - TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=false): arrives as
    *     TIMESTAMP_NTZ → cast to TimestampType (wall clock preserved in the
    *     session TZ; Verify/Bench pin UTC so this matches DuckDB's naive read).
    *   - TIMESTAMP(…, isAdjustedToUTC=true) / INT96: arrives as
    *     TimestampType → pass through.
    * Production readers at 100 TB see exactly this kind of writer drift
    * (mixed Spark/pandas/arrow producers), so the branch is on the observed
    * schema, never an assumed physical type.
    */
  private def normalizeTs(dt: DataType, name: String): Column = dt match {
    case LongType         => timestamp_micros(expr(s"$name div 1000"))
    case TimestampNTZType => col(name).cast(TimestampType)
    case TimestampType    => col(name)
    case other =>
      throw new IllegalStateException(
        s"events.$name: unexpected parquet-decoded type $other; " +
          "expected int64 nanos, TIMESTAMP_NTZ, or TIMESTAMP")
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // Harmless for non-NANOS fixtures; required to read NANOS ones at all.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.withColumn("ts", normalizeTs(raw.schema("ts").dataType, "ts"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
