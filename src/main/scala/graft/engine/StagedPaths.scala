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

  private def fsOf(s: SparkSession,
                   p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def deltaPaths(s: SparkSession,
                         indexPath: String): Seq[org.apache.hadoop.fs.Path] = {
    val root = new org.apache.hadoop.fs.Path(indexPath + "_delta")
    if (fsOf(s, root).exists(root))
      fsOf(s, root).listStatus(root).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("e"))
    else Seq.empty
  }

  /** Base index UNION all deltas of OTHER epochs. */
  def read(s: SparkSession, indexPath: String, excludeEpoch: Long): DataFrame =
    deltaPaths(s, indexPath)
      .filter(_.getName != s"e$excludeEpoch")
      .foldLeft(s.read.parquet(indexPath))((acc, p) =>
        acc.unionByName(s.read.parquet(p.toString)))

  /** The COMPLETE index — base plus every epoch's delta. The read a
    * batch-side caller (outside any epoch) must use: admissions a
    * stream wrote are part of the index, not an implementation
    * detail. */
  def readAll(s: SparkSession, indexPath: String): DataFrame =
    read(s, indexPath, excludeEpoch = -1L)

  /** Overwrite this epoch's delta with `rows` (already checkpointed
    * by the caller); an empty admission clears any stale delta a
    * previous attempt of the same epoch left — never an empty parquet
    * part accumulating on the listing, and never a GHOST admission
    * when the replayed epoch's batch was evicted in the meantime. */
  def write(s: SparkSession, indexPath: String, epochId: Long,
            rows: DataFrame): Unit = {
    val delta = new org.apache.hadoop.fs.Path(dir(indexPath, epochId))
    if (!rows.isEmpty)
      rows.write.mode("overwrite").parquet(delta.toString)
    else if (fsOf(s, delta).exists(delta)) { fsOf(s, delta).delete(delta, true); () }
  }

  /** Fold every delta into the base and remove the delta root — the
    * periodic LSM-style maintenance a long-lived stream schedules
    * (per-epoch read cost and plan depth grow with the OUTSTANDING
    * delta count, so compaction bounds both), and the mandatory step
    * before REUSING an index under a fresh checkpoint: Spark epoch
    * ids restart at 0 with a new checkpoint, and an uncompacted
    * delta namespace would be overwritten epoch by epoch. Staged
    * through a temp dir because parquet cannot overwrite a directory
    * it is concurrently reading. */
  def compact(s: SparkSession, indexPath: String): Unit = {
    if (deltaPaths(s, indexPath).isEmpty) return
    val tmp = indexPath + "_compact_tmp"
    readAll(s, indexPath).write.mode("overwrite").parquet(tmp)
    s.read.parquet(tmp).write.mode("overwrite").parquet(indexPath)
    val root = new org.apache.hadoop.fs.Path(indexPath + "_delta")
    if (fsOf(s, root).exists(root)) fsOf(s, root).delete(root, true)
    val t = new org.apache.hadoop.fs.Path(tmp)
    fsOf(s, t).delete(t, true)
    ()
  }

  /** True when `checkpointDir` already holds a streaming offsets log —
    * i.e. a start() against it RESUMES the epoch-id sequence instead
    * of restarting it at 0. */
  def resumesCheckpoint(s: SparkSession, checkpointDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir, "offsets")
    fsOf(s, p).exists(p)
  }
}
