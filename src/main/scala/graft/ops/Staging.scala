package graft.ops

/** Shared staging-root convention for queries that must materialize an
  * intermediate on-disk artifact (the e2e JSON/CSV fixtures, the format
  * mirrors, the persisted ANN index, the embedded-Derby mirror DB):
  * everything writes under `target/staging/<sf-tag>/<artifact>`, keyed
  * by scale factor, overwritten in place on re-run — so no query
  * invents its own root and every staged byte is discoverable (and
  * `target/`-cleanable) from ONE directory.
  */
private[graft] object Staging {
  def dir(sfDir: String): String =
    s"target/staging/${sfDir.replaceAll("[^0-9A-Za-z.]", "_")}"

  /** File-metadata fingerprint of the named fixture tables under `dir`
    * — sorted (path, length, mtime) triples, md5'd. Metadata-only on
    * purpose: the driver regenerates fixtures in place, so any content
    * change moves a length or mtime without this ever scanning data.
    */
  def sourceFingerprint(dir: String, tables: Seq[String]): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
      else Seq(f)
    val desc = tables.flatMap(t => walk(new java.io.File(s"$dir/$t.parquet")))
      .map(f => s"${f.getPath}:${f.length}:${f.lastModified}")
      .sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(desc.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Run `build` only when `root`'s fingerprint marker differs from
    * `fp` (first run, or the source fixture changed); write the marker
    * AFTER a successful build so a crashed build re-runs. The staged
    * artifact must be a pure function of the fingerprinted sources —
    * the staged-setup convention (idempotent under bench warm pairs
    * and at-least-once re-delivery).
    */
  def ensureStaged(root: String, fp: String)(build: => Unit): Unit = {
    import java.nio.file.{Files, Paths}
    val marker = Paths.get(s"$root/_staged_fingerprint")
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), "UTF-8") == fp
    if (!fresh) {
      build
      Files.createDirectories(marker.getParent)
      Files.write(marker, fp.getBytes("UTF-8"))
    }
  }
}
