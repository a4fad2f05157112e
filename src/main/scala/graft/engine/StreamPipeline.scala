package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Per-topic pluggable message converter (reference O8): the analog of
  * `MessageConverter` (kafka/consumer.go:413-419 — `InferSchema` over a
  * message sample + `ConvertMessage` per message), registered per topic
  * via `WithConverter` (kafka/consumer.go:78-86). Spark-first
  * difference: `convert` rewrites the WHOLE micro-batch DataFrame (a
  * declarative, codegen-able plan), not one message at a time. */
trait MessageConverter {
  /** Infer the payload schema from a sample of raw payloads — the
    * `InferSchema(msgs)` hook (kafka/consumer.go:417-418). */
  def inferSchema(spark: SparkSession, sample: Seq[String]): StructType

  /** Convert a Kafka-shaped micro-batch (key, value, timestamp,
    * offset, partition) into the topic's typed rows — the
    * `ConvertMessage` hook (kafka/consumer.go:414-415), vectorized. */
  def convert(spark: SparkSession, batch: DataFrame, schema: StructType): DataFrame
}

object StreamPipeline {

  /** Map the reference's hardcoded consumer contract
    * (kafka/consumer.go:224-261) onto Spark's Kafka source options:
    *
    *   GroupID            → `kafka.group.id`         (consumer.go:227)
    *   MinBytes 1 KB      → `kafka.fetch.min.bytes`  (consumer.go:229)
    *   MaxBytes 10 MB     → `kafka.fetch.max.bytes`  (consumer.go:230)
    *   StartOffset latest → `startingOffsets`        (consumer.go:231)
    *   batch-size 1024    → `maxOffsetsPerTrigger`   (cmd/serve.go:214;
    *                        rows-per-RecordBatch becomes rows-per-
    *                        micro-batch backpressure)
    *
    * Pure function so the mapping is unit-testable without a broker or
    * the kafka connector jar. */
  def kafkaOptions(servers: String, topic: String,
                   cfg: GraftConfig = GraftConfig.Default): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> servers,
    "subscribe" -> topic,
    "kafka.group.id" -> cfg.groupId,
    "startingOffsets" -> cfg.startingOffsets,
    "kafka.fetch.min.bytes" -> cfg.minFetchBytes.toString,
    "kafka.fetch.max.bytes" -> cfg.maxFetchBytes.toString,
    "maxOffsetsPerTrigger" -> cfg.batchSize.toString)

  /** The reference's consumer constructor (`NewConsumer` +
    * `connectTopic`, kafka/consumer.go:89-118,224-261) as a streaming
    * source: `readStream.format("kafka")` with the option mapping
    * above. The resulting DataFrame has exactly the row shape
    * [[StreamPipeline.start]] ingests (key, value, topic, partition,
    * offset, timestamp, …). Requires the spark-sql-kafka connector on
    * the classpath (not bundled in this offline build — see
    * README §environment; the option mapping itself is covered by
    * spec either way). */
  def kafkaSource(spark: SparkSession, servers: String, topic: String,
                  cfg: GraftConfig = GraftConfig.Default): DataFrame =
    spark.readStream.format("kafka")
      .options(kafkaOptions(servers, topic, cfg))
      .load()
}

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
  * commit.
  *
  * All knobs come from one [[GraftConfig]] (O26); topics with a
  * registered [[MessageConverter]] (O8, `WithConverter`) bypass the
  * default sniff-infer-parse path. */
final class StreamPipeline(
    val store: StreamStore,
    val cfg: GraftConfig = GraftConfig.Default,
    converters: Map[String, MessageConverter] = Map.empty) {

  @volatile private var schemas = Map.empty[String, StructType]

  /** Schema registry per topic, inferred once from the first batch's
    * sample exactly like the reference (kafka/consumer.go:434-458:
    * schema is nil until first flush, then fixed). */
  def schemaFor(topic: String): Option[StructType] = schemas.get(topic)

  /** Start the pipeline over a streaming DataFrame shaped like a
    * Kafka source row: (key, value: String payload, timestamp,
    * offset, partition). Returns the running query. Trigger interval
    * defaults (negative sentinel) to the config's flush timer;
    * an EXPLICIT 0 stays 0 = trigger as fast as possible. */
  def start(spark: SparkSession, source: DataFrame, topic: String,
            intervalMs: Long = -1L): StreamingQuery =
    source.writeStream
      .trigger(Trigger.ProcessingTime(
        if (intervalMs >= 0) intervalMs else cfg.triggerIntervalMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(spark, batch, topic)
      }
      .start()

  /** One micro-batch: infer-on-first-contact, parse, project
    * metadata, append to the bounded store, expire idle streams.
    * All heavy work (parse) is distributed; only the bounded
    * parity-mode buffer collects. A topic with a registered custom
    * converter routes through it instead of the default path (O8). */
  private[engine] def ingestBatch(spark: SparkSession, batch: DataFrame,
                                  topic: String): Unit = {
    import spark.implicits._
    if (batch.isEmpty) { store.expire(); return }
    val payloads = batch.select(col("value").cast("string")).as[String]
    val custom = converters.get(topic)
    val schema = schemas.getOrElse(topic, {
      val sample = payloads.filter((s: String) => s != null)
        .limit(cfg.inferSampleSize).collect().toSeq
      val s0 = custom match {
        case Some(c) => c.inferSchema(spark, sample)
        case None => Ingest.detectFormat(sample) match {
          case "json" => Ingest.inferPayloadSchema(spark, payloads, cfg.inferSampleSize)
          case _      => StructType(Seq(
            org.apache.spark.sql.types.StructField("value",
              org.apache.spark.sql.types.BinaryType)))
        }
      }
      synchronized { schemas += topic -> s0 }
      s0
    })
    val parsed = custom match {
      case Some(c) => c.convert(spark, batch, schema)
      case None =>
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
    }
    // PARITY MODE: the bounded driver-side buffer is the single-node
    // reference semantics (store Scaladoc documents the scale path).
    store.append(topic, parsed.schema, parsed.collect().toSeq)
    store.expire()
    store.registerViews(spark)
  }
}
