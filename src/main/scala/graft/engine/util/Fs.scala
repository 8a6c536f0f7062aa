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

  private val exitPaths = new java.util.concurrent.ConcurrentLinkedQueue[Path]
  @volatile private var exitHookInstalled = false

  /** Delete `p` recursively at JVM exit. One shared shutdown hook drains
    * the whole registry, so callers that create a temp tree per invocation
    * (bench warmup + timed run + verify = three trees in one JVM) accrete
    * queue entries, not hooks.
    */
  def deleteOnExit(p: Path): Unit = {
    exitPaths.add(p)
    if (!exitHookInstalled) synchronized {
      if (!exitHookInstalled) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          var q = exitPaths.poll()
          while (q != null) {
            try deleteRecursively(q) catch { case _: Exception => () }
            q = exitPaths.poll()
          }
        }, "graft-fs-delete-on-exit"))
        exitHookInstalled = true
      }
    }
  }
}
