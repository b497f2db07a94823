package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-JVM scratch directories for queries that materialize intermediate
  * datasets (sink round-trips, the streaming pipeline, the IVF index).
  *
  * One base temp dir per JVM, one subdir per query name, wiped on reuse and
  * deleted on JVM exit — repeated gate runs (Bench times each query, may
  * re-run it for a row count, then Verify and JudgeSmoke run it again)
  * otherwise leak a fresh `Files.createTempDirectory` per invocation into
  * /tmp.
  */
object Scratch {
  private lazy val base: Path = {
    val p = Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
    p
  }

  /** Recursively delete an arbitrary path (no-op if absent). */
  def delete(path: String): Unit = deleteRecursively(java.nio.file.Paths.get(path))

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }

  /** A clean (non-existent) scratch path for `name`; any previous contents
    * from an earlier invocation in this JVM are removed first.
    */
  def fresh(name: String): String = synchronized {
    val d = base.resolve(name)
    deleteRecursively(d)
    d.toString
  }

  /** A scratch path for `name` that keeps existing contents (for
    * build-once-read-many artifacts like the IVF index). Returns the path
    * and whether it already existed.
    */
  def reuse(name: String): (String, Boolean) = synchronized {
    val d = base.resolve(name)
    (d.toString, Files.exists(d))
  }
}
