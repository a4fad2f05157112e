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

/** Per-epoch delta directories for a staged ingest index — the
  * replay-idempotence machinery shared by the text and vector
  * streaming-ingest compositions ([[TextOps.startNeardupIngest]] /
  * [[VectorOps.startAnnIngest]]).
  *
  * Spark's `foreachBatch` is at-least-once: an epoch can replay after
  * a crash between its side effects and the offset commit. Growing
  * the index with a plain parquet APPEND would make a replayed epoch
  * classify its own previously-admitted items as duplicates of
  * themselves. Instead each epoch OVERWRITES its own
  * `<indexPath>_delta/e<epochId>` directory, and the read side unions
  * the base with every delta EXCEPT the current epoch's — a replay
  * therefore probes exactly the index the first attempt saw and
  * leaves exactly one copy of its admissions. A long-lived stream
  * compacts old deltas into the base periodically (the LSM
  * discipline); the union grows with the epoch count, never the
  * corpus. */
private[graft] object DeltaIndex {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  def dir(indexPath: String, epochId: Long): String =
    s"${indexPath}_delta/e$epochId"

  /** Base index UNION all deltas of OTHER epochs. */
  def read(s: SparkSession, indexPath: String, excludeEpoch: Long): DataFrame = {
    val base = s.read.parquet(indexPath)
    val root = new org.apache.hadoop.fs.Path(indexPath + "_delta")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val deltas =
      if (fs.exists(root))
        fs.listStatus(root).toSeq.map(_.getPath)
          .filter(p => p.getName.startsWith("e") &&
            p.getName != s"e$excludeEpoch")
      else Seq.empty
    deltas.foldLeft(base)((acc, p) =>
      acc.unionByName(s.read.parquet(p.toString)))
  }

  /** Overwrite this epoch's delta with `rows` (already checkpointed
    * by the caller); an empty admission clears any stale delta a
    * previous attempt of the same epoch left — never an empty parquet
    * part accumulating on the listing. */
  def write(s: SparkSession, indexPath: String, epochId: Long,
            rows: DataFrame): Unit = {
    val delta = new org.apache.hadoop.fs.Path(dir(indexPath, epochId))
    if (!rows.isEmpty)
      rows.write.mode("overwrite").parquet(delta.toString)
    else {
      val fs = delta.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(delta)) { fs.delete(delta, true); () }
    }
  }
}
