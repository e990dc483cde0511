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
}
