package graft.engine

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

/** Per-topic ingest-outcome counters for the streaming SemDeDup door —
  * the reference's per-stream drop/ingest counter family
  * (`roar_stream_records_dropped` etc., pkg/metrics.go:20-52) applied
  * to what OUR door decides: how many documents/vectors each topic's
  * ingest stream admitted vs classified as duplicates. Fed by
  * [[TextOps.startNeardupIngest]] / [[VectorOps.startAnnIngest]] per
  * epoch from a bounded (≤ 3-row) status rollup of the already-
  * checkpointed classification frame; served through
  * [[MetricsHttpServer]]'s `/metrics` exposition.
  *
  * Statuses are normalized to an operational vocabulary: the text
  * door's `unique` and the vector door's `new` both count as
  * `admitted` (they grew the index); `dup_of_existing` /
  * `dup_in_batch` / `matched` keep their names. Counters are
  * monotone and AT-LEAST-ONCE under foreachBatch replay (a crashed
  * epoch's re-run re-counts its batch — the standard Prometheus
  * counter contract; exactly-once accounting lives in the
  * replay-idempotent index itself, see [[DeltaIndex]]). */
object IngestMetrics {
  private val counts = new ConcurrentHashMap[(String, String), AtomicLong]()
  private val epochs = new ConcurrentHashMap[String, AtomicLong]()

  private def normalize(status: String): String = status match {
    case "unique" | "new" => "admitted"
    case other => other
  }

  private[graft] def add(topic: String, status: String, n: Long): Unit = {
    counts.computeIfAbsent((topic, normalize(status)), _ => new AtomicLong())
      .addAndGet(n)
    ()
  }

  /** One epoch's outcome rollup: a ≤ 3-row groupBy over the epoch's
    * classification frame (callers pass the LOCALLY CHECKPOINTED
    * frame, so this reads cached blocks — the probe pipeline is not
    * re-run). Every epoch counts toward `epochs`, including empty
    * drains (an evicted offset is an epoch that classified nothing —
    * visible as epochs advancing while doc counts stand still). */
  private[graft] def recordEpoch(topic: String, classified: DataFrame): Unit = {
    import org.apache.spark.sql.functions.{count, lit}
    epochs.computeIfAbsent(topic, _ => new AtomicLong()).incrementAndGet()
    classified.groupBy("status").agg(count(lit(1)).as("n")).collect()
      .foreach(r => add(topic, r.getString(0), r.getLong(1)))
  }

  /** (topic, normalized status) → count, for the exposition. */
  def docCounts: Seq[((String, String), Long)] = {
    import scala.jdk.CollectionConverters._
    counts.asScala.map { case (k, v) => k -> v.get() }.toSeq
      .sortBy { case ((t, s), _) => (t, s) }
  }

  /** topic → epochs run (empty drains included). */
  def epochCounts: Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    epochs.asScala.map { case (k, v) => k -> v.get() }.toSeq.sortBy(_._1)
  }

  /** Test isolation hook: drop counters for one topic. */
  private[graft] def reset(topic: String): Unit = {
    import scala.jdk.CollectionConverters._
    counts.keySet.asScala.filter(_._1 == topic)
      .foreach(k => counts.remove(k))
    epochs.remove(topic)
    ()
  }
}
