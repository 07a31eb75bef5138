package graft.core

/** Filesystem helpers shared by the query registries' temp-dir
  * lifecycles (bucketed-table scratch, ORC round trips, store publish
  * staging). One definition so a fix (symlink handling, delete
  * logging) propagates to every caller.
  */
object Fs {

  /** best-effort recursive delete of our own temp trees. */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
