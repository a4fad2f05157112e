package graft

import graft.engine.{GraftConfig, Ingest, MessageConverter, StreamPipeline, StreamStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** O26 typed config, the Kafka consumer-contract mapping, and the O8
  * per-topic converter registry. */
class ConfigAndKafkaSpec extends SparkSuite {

  test("GraftConfig defaults match the reference's shipped defaults (BASELINE.md)") {
    val c = GraftConfig.Default
    assert(c.batchSize == 1024)                       // cmd/serve.go:214
    assert(c.ttlMillis == 60000L)                     // cmd/serve.go:215
    assert(c.bufferLimitBytes == 100L * 1024 * 1024)  // cmd/serve.go:216
    assert(c.triggerIntervalMs == 5000L)              // kafka/consumer.go:319
    assert(c.startingOffsets == "latest")             // kafka/consumer.go:231
    assert(c.minFetchBytes == 1000L)                  // kafka/consumer.go:229
    assert(c.maxFetchBytes == 10000000L)              // kafka/consumer.go:230
    assert(c.inferSampleSize == Ingest.DefaultSampleSize)
  }

  test("GraftConfig parses the reference's flag syntax (--ttl 60s, --buffer-limit 100MB)") {
    assert(GraftConfig.parseDuration("60s") == 60000L)
    assert(GraftConfig.parseDuration("5m") == 300000L)
    assert(GraftConfig.parseDuration("250ms") == 250L)
    assert(GraftConfig.parseDuration("1h") == 3600000L)
    assert(GraftConfig.parseBytes("100MB") == 100L * 1024 * 1024)
    assert(GraftConfig.parseBytes("1GB") == 1024L * 1024 * 1024)
    assert(GraftConfig.parseBytes("512KB") == 512L * 1024)
    val c = GraftConfig.fromFlags(batchSize = 2048, ttl = "5m", bufferLimit = "1GB")
    assert(c.batchSize == 2048 && c.ttlMillis == 300000L &&
      c.bufferLimitBytes == 1024L * 1024 * 1024)
    intercept[IllegalArgumentException](GraftConfig.parseDuration("sixty"))
    intercept[IllegalArgumentException](GraftConfig.parseBytes("100XB"))
  }

  test("GraftConfig file/env layering: defaults < yaml file < env (cmd/root.go:48-74)") {
    // the reference's own config.yaml grammar: sections, comments, quotes
    val yaml =
      """# Roar Configuration
        |kafka:
        |  brokers: "localhost:9092"   # unmapped key: ignored
        |  batch_size: 2048
        |  group_id: "filegroup"
        |stream:
        |  ttl: "5m"
        |  buffer_limit: "1GB"
        |""".stripMargin
    val fileOnly = GraftConfig.layered(fileText = Some(yaml), env = Map.empty)
    assert(fileOnly.batchSize == 2048)
    assert(fileOnly.ttlMillis == 300000L)
    assert(fileOnly.bufferLimitBytes == 1024L * 1024 * 1024)
    assert(fileOnly.groupId == "filegroup")
    // untouched keys keep their defaults
    assert(fileOnly.startingOffsets == GraftConfig.Default.startingOffsets)
    // env beats file for the same key (viper AutomaticEnv), file
    // still wins over defaults for keys the env doesn't set
    val layered = GraftConfig.layered(fileText = Some(yaml),
      env = Map("STREAM_TTL" -> "90s", "KAFKA_STARTING_OFFSETS" -> "earliest"))
    assert(layered.ttlMillis == 90000L, "env must override the file")
    assert(layered.batchSize == 2048, "file must survive where env is silent")
    assert(layered.startingOffsets == "earliest", "env must override defaults")
    // env-name mapping is the viper convention
    assert(GraftConfig.envName("stream.buffer_limit") == "STREAM_BUFFER_LIMIT")
    // no file at all: env still layers over defaults
    val envOnly = GraftConfig.layered(env = Map("KAFKA_BATCH_SIZE" -> "4096"))
    assert(envOnly.batchSize == 4096)
    assert(envOnly.ttlMillis == GraftConfig.Default.ttlMillis)
  }

  test("config threads through store + pipeline (buffer budget honored)") {
    // tiny budget → drop-oldest eviction kicks in, proving the cfg value
    // (not the default) reached the store
    val st = StreamStore(GraftConfig(bufferLimitBytes = 320, ttlMillis = 1000L))
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", LongType)))
    def rows(n: Int) = (0 until n).map(i => org.apache.spark.sql.Row(i.toLong, i.toLong))
    st.append("t", schema, rows(10)) // 10*2*8 = 160 bytes
    st.append("t", schema, rows(10))
    val droppedNow = st.append("t", schema, rows(10)) // budget full → evict oldest
    assert(droppedNow == 10L)
  }

  test("kafkaOptions maps the reference consumer contract (consumer.go:224-261)") {
    val opts = StreamPipeline.kafkaOptions("b1:9092,b2:9092", "orders",
      GraftConfig(groupId = "graft-g1"))
    assert(opts("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(opts("subscribe") == "orders")
    assert(opts("kafka.group.id") == "graft-g1")
    assert(opts("startingOffsets") == "latest")        // StartOffset: LastOffset
    assert(opts("kafka.fetch.min.bytes") == "1000")    // MinBytes 1KB
    assert(opts("kafka.fetch.max.bytes") == "10000000")// MaxBytes 10MB
    assert(opts("maxOffsetsPerTrigger") == "1024")     // --batch-size
  }

  test("kafkaSource builds a kafka-format streaming source (or reports the missing connector)") {
    // The offline build has no spark-sql-kafka connector jar; the
    // constructor must still be the real `readStream.format("kafka")`
    // wiring. With the connector present the plan is a streaming kafka
    // relation; without it Spark must fail lookup for exactly "kafka"
    // (proving we asked for the real source, not a stub).
    try {
      val df = StreamPipeline.kafkaSource(spark, "localhost:9092", "orders")
      assert(df.isStreaming, "kafka source must be a streaming DataFrame")
      val names = df.schema.fieldNames.toSet
      assert(Set("key", "value", "topic", "partition", "offset", "timestamp")
        .subsetOf(names), s"unexpected kafka row shape: $names")
    } catch {
      case e: Exception =>
        val msg = Option(e.getMessage).getOrElse("")
        assert(msg.toLowerCase.contains("kafka"),
          s"expected missing-kafka-connector error, got: $msg")
    }
  }

  test("per-topic converter registry (O8): custom topic converted, other topic default") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // CSV-ish converter: "a,b" payloads → typed (a int, b string) rows.
    // The default path would land these as a binary `value` column.
    val csvish = new MessageConverter {
      def inferSchema(s: SparkSession, sample: Seq[String]): StructType =
        StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
      def convert(s: SparkSession, batch: DataFrame, schema: StructType): DataFrame =
        batch.select(split(col("value").cast("string"), ",").as("p"))
          .select(element_at(col("p"), 1).cast("int").as("a"),
                  element_at(col("p"), 2).as("b"))
    }
    val store = new StreamStore()
    val pipe = new StreamPipeline(store, GraftConfig.Default,
      converters = Map("csv_topic" -> csvish))

    def run(topic: String, payloads: String*): Unit = {
      val mem = MemoryStream[KMsg]
      val q = pipe.start(spark, mem.toDF(), topic, intervalMs = 100)
      try {
        mem.addData(payloads.zipWithIndex.map { case (v, i) =>
          KMsg(s"k$i", v, Timestamp.valueOf("2024-01-01 10:00:00"), i.toLong, 0)
        }: _*)
        q.processAllAvailable()
      } finally q.stop()
    }

    run("csv_topic", "1,x", "2,y")
    run("plain_topic", "not json 1", "not json 2")

    val custom = store.scan(spark, "csv_topic").get
    assert(custom.schema.fieldNames.toSeq == Seq("a", "b"))
    assert(custom.schema("a").dataType == IntegerType)
    assert(custom.orderBy("a").collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "x"), (2, "y")))
    // unregistered topic keeps the default sniff path (binary value)
    val plain = store.scan(spark, "plain_topic").get
    assert(plain.schema("value").dataType == BinaryType)
    assert(plain.count() == 2)
  }
}
