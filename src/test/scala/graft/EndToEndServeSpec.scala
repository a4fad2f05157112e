package graft

import graft.engine.{FlightServe, GraftConfig, StreamPipeline, StreamStore}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** The reference's whole serve path, end to end on our stack:
  * Kafka-shaped stream → StreamPipeline (sniff/infer/parse/meta) →
  * byte-bounded TTL store → catalog views AND Arrow-IPC DoGet — the
  * integration the individual specs cover piecewise. */
class EndToEndServeSpec extends SparkSuite {

  test("stream in, query via catalog, serve via Arrow IPC — one flow") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = StreamStore(GraftConfig.Default)
    val pipe = new StreamPipeline(store, GraftConfig.Default)
    val mem = MemoryStream[KMsg]
    val q = pipe.start(spark, mem.toDF(), "e2e_topic", intervalMs = 100)
    try {
      mem.addData(
        KMsg("k0", """{"item": "a", "amount": 10.5}""", Timestamp.valueOf("2024-01-01 10:00:00"), 0, 0),
        KMsg("k1", """{"item": "b", "amount": 3.25}""", Timestamp.valueOf("2024-01-01 10:00:01"), 1, 1))
      q.processAllAvailable()
      mem.addData(
        KMsg("k2", """{"item": "a", "amount": 1.0}""", Timestamp.valueOf("2024-01-01 10:00:02"), 2, 0))
      q.processAllAvailable()
    } finally q.stop()

    // catalog path (O16-O18): SQL over the registered view
    val agg = spark.sql(
      "SELECT item, SUM(amount) AS total FROM e2e_topic GROUP BY item ORDER BY item")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(agg.toSeq == Seq(("a", 11.5), ("b", 3.25)))

    // Flight-analog path: ListFlights → GetSchema → DoGet, then decode
    // the IPC bytes like an external Arrow client would
    val infos = FlightServe.listFlights(store)
    assert(infos.exists(i => i.topic == "e2e_topic" && i.rows == 3 && i.nBatches == 2))
    val schema = FlightServe.getSchema(store, "e2e_topic").get
    assert(schema.findField("amount") != null && schema.findField("kafka_offset") != null)
    val (ipcSchema, batches) = FlightServe.readIpc(FlightServe.doGet(store, "e2e_topic").get)
    assert(ipcSchema.getFields.size() == schema.getFields.size())
    assert(batches.map(_.size) == Seq(2, 1), "micro-batch boundaries preserved")
    val amountIdx = (0 until ipcSchema.getFields.size())
      .find(i => ipcSchema.getFields.get(i).getName == "amount").get
    val served = batches.flatten.map(_(amountIdx).asInstanceOf[Double]).sorted
    assert(served == Seq(1.0, 3.25, 10.5))
  }
}
