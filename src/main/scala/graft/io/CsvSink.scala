package graft.io

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The reference's only output: ONE headered CSV object under an exact
  * key (`gule_test_job.py:201-211` — driver-side `to_csv` + S3
  * `put_object`). Spark writes a directory of part files, so the
  * single-object contract is met by `coalesce(1)` + a filesystem rename
  * of the lone part file to the requested name — a constant-cost
  * driver-side post-step, not a data-plane collect.
  *
  * `coalesce(1)` funnels the FINAL write through one task by design
  * (the output must be one object); upstream stages keep their
  * parallelism. For outputs too large for a single object, a real
  * deployment would drop this contract, not parallelize around it.
  *
  * Null rendering: Spark's CSV default `nullValue=""` matches the
  * reference's pandas NaN -> empty-field rendering.
  */
object CsvSink {

  /** Writes `df` as `destDir/fileName` (header row, preserved column
    * order). Returns the final path.
    */
  def writeSingleCsv(df: DataFrame, destDir: String, fileName: String): Path = {
    val dest = Paths.get(destDir)
    Files.createDirectories(dest)
    val staging = dest.resolve(s".spark-staging-$fileName")
    deleteRecursively(staging)
    df.coalesce(1)
      .write.mode("overwrite").option("header", value = true)
      .csv(staging.toString)
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
    deleteRecursively(staging)
    target
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.iterator.asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }
}
