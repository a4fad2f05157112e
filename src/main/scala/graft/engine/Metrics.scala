package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Streaming observability (reference O25: ~20 Prometheus counters —
  * pkg/metrics.go:20-52 messages/bytes/batch-latency/drop counters).
  * Spark's StreamingQueryListener delivers the same signals per
  * micro-batch (numInputRows, processedRowsPerSecond, batch duration);
  * this listener accumulates them per query and serves them back as a
  * DataFrame — the `/metrics` endpoint analog. */
final class GraftMetricsListener extends StreamingQueryListener {

  final case class QueryMetrics(
      name: String, batches: Long, inputRows: Long,
      lastInputRowsPerSec: Double, lastDurationMs: Long)

  private val metrics = new ConcurrentHashMap[String, QueryMetrics]()

  override def onQueryStarted(e: QueryStartedEvent): Unit = {
    val name = Option(e.name).getOrElse(e.id.toString)
    metrics.put(e.id.toString, QueryMetrics(name, 0L, 0L, 0.0, 0L))
  }

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    metrics.compute(p.id.toString, (_, prev0) => {
      val prev = Option(prev0).getOrElse(
        QueryMetrics(Option(p.name).getOrElse(p.id.toString), 0L, 0L, 0.0, 0L))
      QueryMetrics(
        prev.name,
        prev.batches + 1,
        prev.inputRows + p.numInputRows,
        p.inputRowsPerSecond,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
    })
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  def snapshot: Seq[QueryMetrics] = metrics.values.asScala.toSeq

  /** Serve accumulated metrics as a DataFrame (the reference serves
    * counters over HTTP /metrics, pkg/metrics.go:231-243). */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshot.map(m => (m.name, m.batches, m.inputRows,
      m.lastInputRowsPerSec, m.lastDurationMs))
      .toDF("query", "batches", "input_rows", "last_rows_per_sec", "last_duration_ms")
  }
}
