package graft

/** Small shared utilities. */
object Util {
  /** Recursive delete (shared by Verify's stale-output cleanup and the
    * bucketed-table location reset). */
  def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmrf))
    f.delete(): Unit
  }
}
