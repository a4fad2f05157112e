package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference's whole serve pipeline (SURVEY.md §3.1, O1-O18)
  * composed end-to-end on Structured Streaming:
  *
  *   source (Kafka / MemoryStream / file) →
  *   format sniff + sample schema inference (O2/O5/O6, one-shot) →
  *   from_json parse + metadata projection (O3/O4, codegen'd) →
  *   foreachBatch → StreamStore append with byte-bounded drop-oldest
  *   eviction + idle-TTL expiry (O12/O14) →
  *   temp-view catalog (O16-O18: list/schema/scan via spark.table)
  *
  * Spark's MicroBatchExecution replaces the reference's goroutine
  * worker pool + channel backpressure (kafka/consumer.go:122-152):
  * trigger interval ≈ the 5s flush timer, `maxOffsetsPerTrigger` ≈
  * batch-size backpressure. Exactly-once into the store per epoch —
  * `foreachBatch` delivers each micro-batch once per successful
  * commit. */
final class StreamPipeline(
    val store: StreamStore,
    inferSampleSize: Int = Ingest.DefaultSampleSize) {

  @volatile private var schemas = Map.empty[String, StructType]

  /** Schema registry per topic, inferred once from the first batch's
    * sample exactly like the reference (kafka/consumer.go:434-458:
    * schema is nil until first flush, then fixed). */
  def schemaFor(topic: String): Option[StructType] = schemas.get(topic)

  /** Start the pipeline over a streaming DataFrame shaped like a
    * Kafka source row: (key, value: String payload, timestamp,
    * offset, partition). Returns the running query. */
  def start(spark: SparkSession, source: DataFrame, topic: String,
            intervalMs: Long = 5000): StreamingQuery =
    source.writeStream
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(spark, batch, topic)
      }
      .start()

  /** One micro-batch: infer-on-first-contact, parse, project
    * metadata, append to the bounded store, expire idle streams.
    * All heavy work (parse) is distributed; only the bounded
    * parity-mode buffer collects. */
  private[engine] def ingestBatch(spark: SparkSession, batch: DataFrame,
                                  topic: String): Unit = {
    import spark.implicits._
    if (batch.isEmpty) { store.expire(); return }
    val payloads = batch.select(col("value").cast("string")).as[String]
    val schema = schemas.getOrElse(topic, {
      val sample = payloads.filter((s: String) => s != null)
        .limit(inferSampleSize).collect().toSeq
      val s0 = Ingest.detectFormat(sample) match {
        case "json" => Ingest.inferPayloadSchema(spark, payloads, inferSampleSize)
        case _      => StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.BinaryType)))
      }
      synchronized { schemas += topic -> s0 }
      s0
    })
    val parsed =
      if (schema.fieldNames.sameElements(Array("value")))
        batch.select(
          col("key").cast("string").as("kafka_key"),
          col("timestamp").as("kafka_timestamp"),
          col("offset").as("kafka_offset"),
          col("partition").cast("int").as("kafka_partition"),
          col("value").cast("binary").as("value"))
      else
        Ingest.parseJsonPayload(
          batch.withColumn("kafka_key", col("key").cast("string"))
            .withColumn("kafka_timestamp", col("timestamp"))
            .withColumn("kafka_offset", col("offset"))
            .withColumn("kafka_partition", col("partition").cast("int")),
          "value", schema,
          keep = Seq("kafka_key", "kafka_timestamp", "kafka_offset", "kafka_partition"))
    // PARITY MODE: the bounded driver-side buffer is the single-node
    // reference semantics (store Scaladoc documents the scale path).
    store.append(topic, parsed.schema, parsed.collect().toSeq)
    store.expire()
    store.registerViews(spark)
  }
}
