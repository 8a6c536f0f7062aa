package graft.engine.util

import java.nio.file.{Files, Path, StandardCopyOption}

/** Small shared filesystem helpers (single recursive-delete code path for
  * the sinks and the silver rebuild).
  */
object Fs {
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }

  /** Replace `target` with `src` (delete old, move new into place). The
    * unprotected window is two metadata operations, not a whole job.
    */
  def replace(src: Path, target: Path): Unit = {
    deleteRecursively(target)
    Files.createDirectories(target.getParent)
    Files.move(src, target, StandardCopyOption.ATOMIC_MOVE)
  }
}
