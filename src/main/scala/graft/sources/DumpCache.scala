package graft.sources

/** Cross-run cache directories for derived dumps of immutable test data.
  *
  * Keyed by an MD5 of the source file's CANONICAL path + size + mtime:
  * distinct source dirs can never collide (128-bit digest of the full
  * path, not a 32-bit hashCode), and any change to the source file
  * (size or mtime) invalidates the key, so stale reuse is impossible —
  * a new fingerprint simply lands in a fresh directory.
  */
object DumpCache {

  /** Stable cache dir under java.io.tmpdir for a derived artifact of
    * `sourceFile` inside `dir`. Populate it through [[ensure]].
    */
  def dirFor(prefix: String, dir: String, sourceFile: String): String = {
    val f = new java.io.File(dir, sourceFile)
    val key = s"${f.getCanonicalPath}:${f.length}:${f.lastModified}"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString
    s"${System.getProperty("java.io.tmpdir")}/${prefix}_$hex"
  }

  def isReady(path: String): Boolean =
    new java.io.File(s"$path/_SUCCESS").exists()

  /** Populate `path` atomically: the artifact is written to a sibling temp
    * dir and renamed into place only once complete (`_SUCCESS` present in
    * the temp dir), so a reader can never observe a half-written dump and
    * two concurrent writers race only on the final rename — the loser's
    * temp dir is discarded. Returns `path`.
    */
  def ensure(path: String)(write: String => Unit): String = {
    if (isReady(path)) return path
    val dest = new java.io.File(path)
    val tmp = new java.io.File(
      path + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    try {
      write(tmp.getPath)
      if (!isReady(tmp.getPath))
        throw new java.io.IOException(s"dump writer left no _SUCCESS in $tmp")
      if (!tmp.renameTo(dest) && !isReady(path)) {
        // stale half-written destination (e.g. a crashed legacy writer):
        // clear it and retry once; a concurrent complete winner is kept
        deleteRecursively(dest)
        if (!tmp.renameTo(dest) && !isReady(path))
          throw new java.io.IOException(s"could not publish dump at $path")
      }
      path
    } finally {
      // rename success leaves nothing at tmp; every other exit (lost
      // race, failed write, thrown error) must not leak the dump copy
      if (tmp.exists()) deleteRecursively(tmp)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
  }
}
