package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Scratch-directory lifecycle for the streaming twins, job round-trip
  * queries, and tests. Every scratch dir is registered at creation and
  * removed either eagerly (via [[delete]], once the caller has
  * materialized what it needs) or by the JVM shutdown hook — so a full
  * bench/verify sweep leaves /tmp net-zero instead of accreting
  * `graft-*` dirs run over run (the r7 sweeps left 200+ stale dirs,
  * and the resulting FS pressure feeds the very timing noise the bench
  * methodology exists to defeat).
  *
  * Deletion is recursive and best-effort: a file deleted concurrently
  * (e.g. Spark's own temp-file cleanup inside the dir) must not abort
  * the sweep of the remaining entries.
  */
object TempDirs {

  private val live =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  // Registered through Hadoop's ShutdownHookManager (the registry
  // Spark itself uses), at a priority BELOW Spark's temp-dir hook
  // (25) and SparkContext stop (50): a plain Runtime hook runs
  // concurrently with Spark's, and deleting a warehouse/checkpoint
  // dir while Spark is still flushing it produces noisy shutdown
  // exceptions. Below-Spark priority means we run strictly after
  // Spark has finished its own shutdown.
  org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
    new Runnable {
      override def run(): Unit = { live.forEach(deleteTree(_)); live.clear() }
    }, 10)

  /** Create a fresh temp dir registered for deletion at JVM exit. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    live.add(p)
    p.toString
  }

  /** Eagerly delete a dir created by [[create]] (idempotent). */
  def delete(dir: String): Unit = {
    val p = Paths.get(dir)
    live.remove(p)
    deleteTree(p)
  }

  private def deleteTree(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
        finally walk.close()
      }
    } catch { case _: Exception => () }
}
