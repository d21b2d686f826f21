package graft.util

import java.nio.file.{Files, Path}

/** Temp directories with best-effort JVM-exit cleanup: gate harnesses build
  * per-run scratch datasets (tablesets, IVF indexes) that would otherwise
  * accumulate on the driver host across verify/bench runs. */
object TempDirs {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach { p =>
        try deleteRecursively(p.toFile) catch { case _: Throwable => () }
      }
    }, "graft-tempdir-cleanup"))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Create a temp directory removed (best-effort) at JVM exit. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }
}
