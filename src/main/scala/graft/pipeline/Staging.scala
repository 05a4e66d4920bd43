package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Tiny lifecycle helpers for operator staging directories (the multi-job
  * dedup/ANN paths write an intermediate parquet once so downstream plan
  * branches read the slim staged table instead of recomputing the upstream
  * scan per branch). Callers own the directory; these helpers make owning
  * it easy.
  */
object Staging {

  def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toAbsolutePath.toString

  def deleteRecursively(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try stream.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally stream.close()
    }
  }

  /** A unique temp dir removed at JVM exit — for driver-style callers that
    * consume the staged frame within the process lifetime (Verify/Bench).
    * Long-running services should delete explicitly after the last action
    * over the returned frame instead. ONE shutdown hook drains a shared
    * queue: registering a hook per dir would grow the JVM's hook list (and
    * its identity map) without bound in a loop that stages repeatedly.
    */
  def tempDirDeletedOnExit(prefix: String): String = {
    val d = tempDir(prefix)
    exitDirs.add(d)
    d
  }

  private val exitDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    var d = exitDirs.poll()
    while (d != null) {
      try deleteRecursively(d) catch { case _: Exception => () }
      d = exitDirs.poll()
    }
  }))
}
