package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Partitioned-parquet warehouse writes — the production-scale
  * counterpart of [[CsvSink]]'s one-object report contract.
  *
  * At 100 TB a table is written as a directory tree partitioned by a
  * low-cardinality key (`dt=2026-08-12/part-*.parquet`): readers prune
  * whole partitions from the file listing before any I/O, and
  * incremental jobs rewrite only the partitions they touched. Two
  * contracts matter and both are encoded here:
  *
  *  - DYNAMIC partition overwrite: `mode=overwrite` with
  *    `partitionOverwriteMode=dynamic` replaces only partitions present
  *    in this batch. Spark's default (static) mode would first DELETE
  *    every existing partition — an incremental daily job would wipe
  *    history. The setting rides on the writer, not the session, so
  *    concurrent writers aren't affected.
  *  - In-partition file sizing via `maxRecordsPerFile` rather than a
  *    global repartition: the writer stays parallel across partitions
  *    and splits oversized partitions into bounded files (the
  *    small-files/giant-file trade-off is the written table's scan
  *    parallelism on the NEXT read).
  */
object ParquetSink {

  /** Writes `df` under `destDir` partitioned by `partitionCols`,
    * replacing only the partitions present in `df`.
    */
  def writePartitioned(
      df: DataFrame,
      destDir: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 1000000L): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(destDir)
  }
}
