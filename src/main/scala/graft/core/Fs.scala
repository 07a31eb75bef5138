package graft.core

/** Filesystem helpers shared by the query registries' temp-dir
  * lifecycles (bucketed-table scratch, ORC round trips, store publish
  * staging). One definition so a fix (symlink handling, delete
  * logging) propagates to every caller.
  */
object Fs {

  /** best-effort recursive delete of our own temp trees. A directory
    * SYMLINK is deleted as a link, never followed — `listFiles` on a
    * link returns the TARGET's children, so recursing would delete
    * data outside the tree (e.g. a tmpdir on a symlinked mount). */
  def deleteRecursively(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
