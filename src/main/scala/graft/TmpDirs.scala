package graft

/** Per-process temp roots for entries that round-trip through disk
  * (events_zorder's layout, the streaming file sinks/checkpoints).
  *
  * The root is fixed WITHIN a process — overwrite/wipe reuse, so repeated
  * Verify/Bench passes don't leak a parquet copy per invocation — but
  * unique ACROSS processes, so concurrent harness JVMs (sbt test vs Bench
  * vs Verify on the same host) never clobber each other's files mid-read.
  * The whole root is removed on JVM exit.
  */
object TmpDirs {
  private lazy val root: java.io.File = {
    val d = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${ProcessHandle.current().pid()}")
    d.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(d)))
    d
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }

  /** Absolute path of a named sub-dir, prior contents wiped. */
  def wiped(sub: String): String = {
    val d = new java.io.File(root, sub)
    if (d.exists()) deleteRec(d)
    d.getAbsolutePath
  }

  /** Absolute path of a named sub-dir, contents kept (overwrite targets). */
  def path(sub: String): String = new java.io.File(root, sub).getAbsolutePath

  /** Collision-proof key for a directory path used in on-disk artifact /
    * catalog names: the human-readable sanitized form PLUS an md5 prefix
    * of the FULL path. The sanitizing replaceAll alone is non-injective
    * (ADVICE r6: '/data/sf0.1' vs '/data/sf0_1' collapse), so two
    * distinct dirs could share one artifact location while being memoized
    * separately — re-introducing the alternate-rebuild hazard the full-dir
    * memo keying closed. The md5 suffix makes the key injective in
    * practice; the Alnum variant is for consumers with narrower naming
    * rules (catalog table names reject dots). */
  def dirKey(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + md5Prefix(dir)

  def dirKeyAlnum(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9_]", "_") + "_" + md5Prefix(dir)

  private def md5Prefix(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
}
