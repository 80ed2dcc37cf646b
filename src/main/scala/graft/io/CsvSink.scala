package graft.io

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions.{count, lit}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The reference's only output: ONE headered CSV object under an exact
  * key (`gule_test_job.py:201-211` — driver-side `to_csv` + S3
  * `put_object`). Spark writes a directory of part files, so the
  * single-object contract is met by a single-partition write + a
  * filesystem rename of the lone part file to the requested name — a
  * constant-cost driver-side post-step, not a data-plane collect.
  *
  * `repartition(1)`, NOT `coalesce(1)`: coalesce folds into the parent
  * stage, and because the merge is a broadcast join with no shuffle
  * between the primary scan and the write, coalesce(1) would collapse
  * the WHOLE read+join pipeline into one task — recreating the
  * reference's single-threaded bottleneck. repartition inserts a
  * shuffle, so upstream stages keep their parallelism and only the
  * final write is single-task (which the one-object contract forces).
  * For outputs too large for a single object, a real deployment drops
  * this contract, not parallelizes around it.
  *
  * Null rendering: Spark's CSV default `nullValue=""` matches the
  * reference's pandas NaN -> empty-field rendering.
  */
object CsvSink {

  /** Writes `df` as `destDir/fileName` (header row, preserved column
    * order). Returns the final path and the row count, observed DURING
    * the write via [[Observation]] — the success-report count rides the
    * write pass for free instead of re-scanning the output (an extra
    * full pass over the artifact at production scale). Counting before
    * serialization is also immune to quoted-newline miscounts by
    * construction.
    */
  def writeSingleCsv(df: DataFrame, destDir: String, fileName: String): (Path, Long) = {
    val dest = Paths.get(destDir)
    Files.createDirectories(dest)
    // unique staging suffix: a deterministic name would let two
    // concurrent writers of the same destination delete/consume each
    // other's in-flight staging output; uniqueness confines the race
    // to the final atomic move. The unique name also means the path
    // can never pre-exist — staging cleanup happens in the finally,
    // so a FAILED write cannot orphan its staging dir either.
    val staging = dest.resolve(
      s".spark-staging-$fileName-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      val obs = Observation()
      // observe AFTER the repartition: in the post-shuffle RESULT stage
      // the metric is exactly-once, while a map-stage observation would
      // double-count rows under stage retries / speculative duplicates
      df.repartition(1)
        .observe(obs, count(lit(1)).as("rows"))
        .write.mode("overwrite").option("header", value = true)
        .csv(staging.toString)
      val rows = obs.get("rows").asInstanceOf[Long]
      val listing = Files.list(staging)
      val part =
        try listing.iterator.asScala
          .find(p => p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".csv"))
          .getOrElse(throw new IllegalStateException(
            s"CSV write produced no part file under $staging"))
        finally listing.close()
      val target = dest.resolve(fileName)
      Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
      (target, rows)
    } finally deleteRecursively(staging)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.iterator.asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }
}
