package graft

import graft.engine.{Ddl, StreamPipeline, StreamStore}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Kafka-shaped source row for the end-to-end pipeline tests. */
case class KMsg(key: String, value: String, timestamp: Timestamp,
                offset: Long, partition: Int)

/** End-to-end serve pipeline (SURVEY.md §3.1): source → infer →
  * parse+meta → bounded store → catalog. */
class StreamPipelineSpec extends SparkSuite {
  import spark.implicits._

  private def msg(o: Long, v: String) =
    KMsg(s"k$o", v, Timestamp.valueOf("2024-01-01 10:00:00"), o, (o % 2).toInt)

  test("json topic: infer once, parse, project kafka metadata, serve via catalog") {
    implicit val sqlCtx = spark.sqlContext
    val store = new StreamStore()
    val pipe = new StreamPipeline(store)
    val mem = MemoryStream[KMsg]
    val q = pipe.start(spark, mem.toDF(), "orders_topic", intervalMs = 100)
    try {
      mem.addData(msg(0, """{"amount": 10, "item": "a"}"""),
                  msg(1, """{"amount": 2.5, "item": "b"}"""))
      q.processAllAvailable()
      mem.addData(msg(2, """{"amount": 7, "item": "c", "unknown_later_field": 1}"""))
      q.processAllAvailable()
    } finally q.stop()

    // schema inferred once from first batch: amount promoted to double
    val s = pipe.schemaFor("orders_topic").get
    assert(s("amount").dataType == DoubleType)
    // metadata columns prepended (consumer.go:833-839)
    val served = spark.table("orders_topic")
    assert(served.columns.take(4).toSeq ==
      Seq("kafka_key", "kafka_timestamp", "kafka_offset", "kafka_partition"))
    assert(served.count() == 3)
    // field unknown at inference time is dropped (consumer.go:630-634)
    assert(!served.columns.contains("unknown_later_field"))
    assert(store.listTopics() == Seq("orders_topic"))
  }

  test("binary topic: non-JSON payloads land as a single value column (consumer.go:858-861)") {
    implicit val sqlCtx = spark.sqlContext
    val store = new StreamStore()
    val pipe = new StreamPipeline(store)
    val mem = MemoryStream[KMsg]
    val q = pipe.start(spark, mem.toDF(), "raw_topic", intervalMs = 100)
    try {
      mem.addData(msg(0, "not json at all"), msg(1, "still not"))
      q.processAllAvailable()
    } finally q.stop()
    val served = store.scan(spark, "raw_topic").get
    assert(served.schema("value").dataType == BinaryType)
    assert(served.count() == 2)
  }

  test("eviction applies through the pipeline (manager.go:286-310)") {
    implicit val sqlCtx = spark.sqlContext
    // budget: 5 cols × 8 bytes = 40 B/row → 10 rows max
    val store = new StreamStore(maxBytesPerStream = 400)
    val pipe = new StreamPipeline(store)
    val mem = MemoryStream[KMsg]
    val q = pipe.start(spark, mem.toDF(), "small_topic", intervalMs = 100)
    try {
      (0 until 4).foreach { b =>
        mem.addData((0 until 5).map(i => msg(b * 5 + i, "plain")): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val served = store.scan(spark, "small_topic").get
    assert(served.count() <= 10)
    assert(store.droppedRows("small_topic") >= 10)
    // newest rows retained (drop-OLDEST)
    assert(served.agg(max("kafka_offset")).head().getLong(0) == 19)
  }

  test("DDL generation mirrors the sink type map (duckdb/sink.go:184-250)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("ts", TimestampType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("nested", StructType(Seq(StructField("x", LongType))))))
    val sql = Ddl.createTableSql("events", schema)
    assert(sql ==
      """CREATE TABLE IF NOT EXISTS "events" ("id" BIGINT NOT NULL, """ +
      """"name" VARCHAR, "ts" TIMESTAMP NOT NULL, "payload" BLOB, "nested" VARCHAR)""")
  }

  test("ASCII table formatting renders nulls as NULL (cmd/client.go:174-224)") {
    val df = Seq((1L, Some("a")), (2L, None)).toDF("id", "s")
    val out = Ddl.formatTable(df.orderBy("id"), limit = 10)
    assert(out.contains("NULL"))
    assert(out.linesIterator.size == 6) // sep, header, sep, 2 rows, sep
  }
}
