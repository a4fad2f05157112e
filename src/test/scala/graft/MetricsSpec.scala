package graft

import graft.engine.{GraftMetricsListener, StreamingOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** StreamingQueryListener-based observability (reference O25 analog). */
class MetricsSpec extends SparkSuite {
  import spark.implicits._

  test("listener accumulates per-query batch and row counters (pkg/metrics.go analog)") {
    implicit val sqlCtx = spark.sqlContext
    val listener = new GraftMetricsListener
    spark.streams.addListener(listener)
    try {
      val mem = MemoryStream[Ev]
      val q = StreamingOps.streamingTumbling(mem.toDF())
        .writeStream.outputMode("complete")
        .format("memory").queryName("metrics_probe").start()
      try {
        mem.addData(Ev(Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0))
        q.processAllAvailable()
        mem.addData(
          Ev(Timestamp.valueOf("2024-01-01 10:06:00"), "view", 2.0),
          Ev(Timestamp.valueOf("2024-01-01 10:07:00"), "view", 3.0))
        q.processAllAvailable()
      } finally q.stop()
      // listener events are async — wait for delivery
      var tries = 0
      def rows = listener.snapshot.find(_.name == "metrics_probe")
      while (tries < 50 && !rows.exists(_.inputRows >= 3)) {
        Thread.sleep(100); tries += 1
      }
      val m = rows.get
      assert(m.inputRows == 3, s"expected 3 input rows, got $m")
      assert(m.batches >= 2)
      val df = listener.toDF(spark)
      assert(df.columns.toSeq ==
        Seq("query", "batches", "input_rows", "last_rows_per_sec", "last_duration_ms"))
      assert(df.count() >= 1)
    } finally spark.streams.removeListener(listener)
  }
}
