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

  private def epochOf(p: org.apache.hadoop.fs.Path): Long =
    p.getName.drop(1).toLong

  private def deltaPaths(s: SparkSession,
                         indexPath: String): Seq[org.apache.hadoop.fs.Path] = {
    val root = new org.apache.hadoop.fs.Path(indexPath + "_delta")
    if (fsOf(s, root).exists(root))
      fsOf(s, root).listStatus(root).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("e"))
    else Seq.empty
  }

  /** Outstanding (un-compacted) delta count — what the ingest streams'
    * periodic-compaction trigger and the specs observe. */
  def outstanding(s: SparkSession, indexPath: String): Int =
    deltaPaths(s, indexPath).size

  /** Base index UNION all deltas of OTHER epochs. */
  def read(s: SparkSession, indexPath: String, excludeEpoch: Long): DataFrame = {
    finishCrashedCompact(s, indexPath)
    deltaPaths(s, indexPath)
      .filter(_.getName != s"e$excludeEpoch")
      .foldLeft(s.read.parquet(indexPath))((acc, p) =>
        acc.unionByName(s.read.parquet(p.toString)))
  }

  /** The COMPLETE index — base plus every epoch's delta. The read a
    * batch-side caller (outside any epoch) must use: admissions a
    * stream wrote are part of the index, not an implementation
    * detail.
    *
    * CONCURRENCY BOUNDARY: [[IngestWriters]] serializes WRITERS, not
    * reader-vs-compactor — a batch-side read whose parquet listing was
    * planned just before a live stream's mid-epoch compaction swapped
    * the base can fail with files-updated/not-found when it executes
    * (overwrite-in-place has no snapshot isolation). Run batch
    * classifies against a quiescent index, or from inside the owning
    * stream's `onEpoch` (which is serialized with its compactions). A
    * failed read is LOUD and retryable — never wrong results. At
    * 100 TB the index lives in a snapshot-isolated table format
    * (Iceberg-style) where compaction and reads never conflict; the
    * in-place swap is the parity-mode single-process analog. */
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

  private def markerPath(indexPath: String) =
    new org.apache.hadoop.fs.Path(indexPath + "_compact_commit")
  private def tmpPath(indexPath: String) =
    new org.apache.hadoop.fs.Path(indexPath + "_compact_tmp")

  /** Fold the deltas of epochs `< belowEpoch` into the base — the
    * periodic LSM-style maintenance [[graft.engine.TextOps.startNeardupIngest]] /
    * [[graft.engine.VectorOps.startAnnIngest]] schedule between
    * micro-batches (per-epoch read cost and plan depth grow with the
    * OUTSTANDING delta count, so compaction bounds both), and — with
    * the default belowEpoch = fold EVERYTHING — the mandatory step
    * before REUSING an index under a fresh checkpoint: Spark epoch ids
    * restart at 0 with a new checkpoint, and an uncompacted delta
    * namespace would be overwritten epoch by epoch.
    *
    * MID-STREAM SAFETY: folding an epoch's delta into the base is only
    * replay-safe once that epoch can never re-run. foreachBatch(N)
    * runs strictly after epoch N-1's offsets committed, so a stream
    * compacting with `belowEpoch = currentEpoch` at the top of its
    * epoch folds exactly the never-again-replayed set — a stale
    * `e<current>` from a crashed prior attempt is left alone for the
    * replay to overwrite.
    *
    * CRASH-ATOMIC via a commit marker (the 'exactly one copy' contract
    * survives a crash at any step):
    *   1. merged (base ∪ folded deltas) → `_compact_tmp`
    *   2. marker listing the folded delta dirs renamed into place
    *      (atomic publish — no marker, no state change)
    *   3. delete base, RENAME tmp → base
    *   4. delete the folded delta dirs (root too when empty)
    *   5. delete the marker
    * [[finishCrashedCompact]] (run before every read and compact)
    * replays 3-5 from the marker: each step is idempotent and the tmp
    * is complete before the marker can exist, so admissions are never
    * lost and never double-counted. Single in-process writer per index
    * by [[IngestWriters]] contract. */
  def compact(s: SparkSession, indexPath: String,
              belowEpoch: Long = Long.MaxValue): Unit = {
    finishCrashedCompact(s, indexPath)
    val folded = deltaPaths(s, indexPath).filter(epochOf(_) < belowEpoch)
    if (folded.isEmpty) return
    val fs = fsOf(s, markerPath(indexPath))
    // A stale tmp from a pre-marker crashed attempt is dropped OUTRIGHT
    // before rebuilding: under partitionOverwriteMode=dynamic a
    // partitioned overwrite replaces only the partitions present in
    // the new image, so ghost partitions from the earlier attempt
    // could otherwise ride the swap into the base and duplicate
    // admissions (a pre-marker tmp is never authoritative — no marker,
    // no state change).
    if (fs.exists(tmpPath(indexPath)))
      require(fs.delete(tmpPath(indexPath), true),
        s"compact: could not clear stale ${tmpPath(indexPath)}")
    // 1. complete merged image beside the base — PRESERVING the base's
    // partition layout: a bucket-partitioned index (stageAnnIndex
    // bucketPartitioned = true) folded to flat parquet would silently
    // lose its partition dirs and every later partition-pruned probe
    // would degrade to a full-index scan. The partition columns come
    // from Spark's OWN inference over the base (handles multi-column
    // layouts; a stray name=value file a dir listing would misread is
    // judged exactly as the reader judges it).
    val baseDf = s.read.parquet(indexPath)
    val partCols: Seq[String] = baseDf.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.partitionSchema.fieldNames.toSeq
          case _ => Seq.empty[String]
        }
    }.getOrElse(Seq.empty)
    val merged = folded.foldLeft(baseDf)((acc, p) =>
      acc.unionByName(s.read.parquet(p.toString), allowMissingColumns = false))
    val w = merged.write.mode("overwrite")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
      .parquet(tmpPath(indexPath).toString)
    // 2. marker: folded dir names, one per line, renamed into place.
    // The rename result is CHECKED: proceeding to the swap without a
    // durable marker would leave a crash window with no recovery.
    val staging = new org.apache.hadoop.fs.Path(
      indexPath + "_compact_commit.staging")
    val out = fs.create(staging, true)
    try out.write(folded.map(_.getName).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(staging, markerPath(indexPath)),
      s"compact marker publish failed for $indexPath — aborting before any state change")
    publishCompact(s, indexPath, folded.map(_.getName))
  }

  /** Steps 3-5 of the compact protocol — idempotent, so a crash at any
    * point replays cleanly from the marker. Every delete/rename result
    * on the SWAP path is checked: a failed swap must abort loudly
    * BEFORE the folded deltas and the marker are retired — the
    * on-disk state (marker + tmp + deltas) stays fully recoverable and
    * the next access retries; silently proceeding would orphan the
    * merged image and lose the folded admissions forever. */
  private def publishCompact(s: SparkSession, indexPath: String,
                             foldedNames: Seq[String]): Unit = {
    val base = new org.apache.hadoop.fs.Path(indexPath)
    val tmp = tmpPath(indexPath)
    val fs = fsOf(s, base)
    // 3. swap the merged image in (rename, not rewrite: atomic on a
    // posix fs and never leaves a half-written base)
    if (fs.exists(tmp)) {
      if (fs.exists(base)) require(fs.delete(base, true),
        s"compact swap: could not delete stale base $indexPath — " +
          "aborting with marker+tmp+deltas intact (recoverable)")
      require(fs.rename(tmp, base),
        s"compact swap: could not rename ${tmp} to $indexPath — " +
          "aborting with marker+tmp+deltas intact (recoverable)")
    }
    // 4. drop exactly the folded deltas (later epochs' deltas survive)
    val root = new org.apache.hadoop.fs.Path(indexPath + "_delta")
    foldedNames.foreach { n =>
      val p = new org.apache.hadoop.fs.Path(root, n)
      if (fs.exists(p)) fs.delete(p, true)
    }
    if (fs.exists(root) && fs.listStatus(root).isEmpty) fs.delete(root, true)
    // 5. retire the marker
    fs.delete(markerPath(indexPath), false)
    ()
  }

  /** Recovery hook: when a compact crashed after publishing its marker
    * (between steps 2 and 5), finish it before serving any read — the
    * on-disk state may otherwise hold a folded delta twice (marker
    * present, base already swapped) or a mid-swap base. No marker →
    * no-op (one `exists` probe on the hot path). */
  private def finishCrashedCompact(s: SparkSession, indexPath: String): Unit = {
    val marker = markerPath(indexPath)
    val fs = fsOf(s, marker)
    if (!fs.exists(marker)) return
    val in = fs.open(marker)
    val names = try scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString.split("\n").toSeq.filter(_.nonEmpty)
    finally in.close()
    publishCompact(s, indexPath, names)
  }

  /** Compact from inside a running stream's epoch N when the
    * committed (< N) delta count reached `every` — the cleanupLoop
    * discipline, bounded so a long-lived stream's per-probe plan depth
    * never exceeds `every` delta reads plus the base. */
  def maybeCompact(s: SparkSession, indexPath: String, epochId: Long,
                   every: Int): Unit =
    if (every > 0 &&
        deltaPaths(s, indexPath).count(epochOf(_) < epochId) >= every)
      compact(s, indexPath, belowEpoch = epochId)

  /** True when `checkpointDir` already holds a streaming offsets log —
    * i.e. a start() against it RESUMES the epoch-id sequence instead
    * of restarting it at 0. */
  def resumesCheckpoint(s: SparkSession, checkpointDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir, "offsets")
    fsOf(s, p).exists(p)
  }
}

/** In-process single-writer guard for a staged ingest index: the
  * [[DeltaIndex]] namespace is PER-EPOCH-ID, and epoch ids are
  * per-checkpoint — two concurrent streams sharing one `indexPath`
  * under different checkpoints would both write `_delta/e<n>` and
  * destroy each other's admissions (and race each other's
  * compactions). `startNeardupIngest`/`startAnnIngest` therefore
  * ACQUIRE the index before starting and the second concurrent writer
  * is rejected loudly, naming both checkpoints. A STOPPED stream's
  * claim is reclaimable (acquire steals from an inactive query), so
  * the documented sequential-reuse flow — stop, then start under a
  * fresh checkpoint with compact-first — still works unchanged.
  *
  * Scope: in-process, matching the store's parity-mode topology (the
  * buffer is driver-held, so every realistic writer shares this JVM).
  * Two JVMs sharing an index over a shared filesystem are outside the
  * reference's single-process design and this guard. */
private[graft] object IngestWriters {
  import org.apache.spark.sql.streaming.StreamingQuery

  private final class Writer(val checkpointDir: String) {
    @volatile var query: Option[StreamingQuery] = None
  }
  private val live =
    new java.util.concurrent.ConcurrentHashMap[String, Writer]()

  private def key(indexPath: String): String =
    try new java.io.File(indexPath).getCanonicalPath
    catch { case _: java.io.IOException =>
      new java.io.File(indexPath).getAbsolutePath }

  /** Claim the index for one stream, atomically. A claim whose query
    * is no longer active (stopped, failed) is reclaimed; a LIVE claim
    * under a different checkpoint fails fast. Mid-start claims (query
    * not yet bound) count as live — the window is one start() call. */
  def acquire(indexPath: String, checkpointDir: String): Unit = {
    val k = key(indexPath)
    while (true) {
      val mine = new Writer(checkpointDir)
      val cur = live.putIfAbsent(k, mine)
      if (cur == null) return
      val reclaimable = cur.query.exists(q => !q.isActive)
      if (reclaimable) {
        if (live.replace(k, cur, mine)) return
        // lost the race to another acquire — retry
      } else throw new IllegalStateException(
        s"index '$indexPath' already has a live ingest writer " +
          s"(checkpoint '${cur.checkpointDir}'); a second stream " +
          s"(checkpoint '$checkpointDir') would overwrite its " +
          "_delta/e<n> admissions. Stop the first stream, or give " +
          "each stream its own indexPath.")
    }
  }

  /** Bind the started query to its claim so a later acquire can tell
    * stopped from live. */
  def bind(indexPath: String, q: StreamingQuery): Unit = {
    val w = live.get(key(indexPath))
    if (w != null) w.query = Some(q)
  }

  /** Drop a claim (start() failed before a query existed). */
  def release(indexPath: String): Unit = { live.remove(key(indexPath)); () }

  /** The live claim's checkpoint, for specs. */
  def liveCheckpoint(indexPath: String): Option[String] = {
    val w = live.get(key(indexPath))
    if (w == null) None
    else if (w.query.exists(q => !q.isActive)) None
    else Some(w.checkpointDir)
  }
}
