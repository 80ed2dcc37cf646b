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
}
