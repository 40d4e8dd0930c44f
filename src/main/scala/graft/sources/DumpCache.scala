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
    * `sourceFile` inside `dir`. The caller writes the artifact there iff
    * `_SUCCESS` is absent.
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
}
