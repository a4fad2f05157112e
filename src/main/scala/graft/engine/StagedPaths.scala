package graft.engine

/** Collision-free tmp paths for the staged-table memos.
  *
  * The previous scheme suffixed paths with
  * `Integer.toHexString(datasetDir.hashCode)`: two dataset dirs with
  * colliding String hashCodes in one JVM would `mode("overwrite")`
  * the same path and silently serve one dataset's staged
  * edges/pairs/bigrams to the other. Since every call site sits
  * inside a per-dataset `computeIfAbsent`, a process-wide counter is
  * unique by construction — each distinct dataset dir draws a fresh
  * suffix exactly once.
  *
  * Staged files are also registered for recursive deletion at JVM
  * exit (they are per-process scratch, not a durable cache).
  */
private[graft] object StagedPaths {
  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)
  private val toDelete = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      toDelete.forEach(p => delete(new java.io.File(p)))
    }, "graft-staged-paths-cleanup"))
  }

  /** pid + process-wide counter — unique per memoized dataset entry. */
  def suffix(): String =
    s"${ProcessHandle.current().pid()}_${counter.incrementAndGet()}"

  /** A fresh `$tmpdir/<prefix>_<pid>_<n>` path, registered for
    * shutdown cleanup. */
  def tmp(prefix: String): String =
    register(s"${System.getProperty("java.io.tmpdir")}/${prefix}_${suffix()}")

  /** Register an externally-built staged path for shutdown cleanup. */
  def register(path: String): String = {
    hook
    toDelete.add(path)
    path
  }

  private def delete(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(delete)
    f.delete()
    ()
  }
}
