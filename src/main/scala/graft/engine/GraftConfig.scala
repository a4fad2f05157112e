package graft.engine

/** Typed configuration surface (reference O26): ONE object holding
  * every knob the reference scatters across serve flags
  * (`cmd/serve.go:211-223`) and hardcoded consumer constants
  * (`kafka/consumer.go:229-231,319`), threaded through
  * [[StreamPipeline]] / [[StreamStore]] instead of per-call
  * parameters. Defaults match the reference's shipped defaults
  * (BASELINE.md "Shipped performance-relevant defaults").
  *
  * @param batchSize          max records per micro-batch / RecordBatch
  *                           (`--batch-size`, cmd/serve.go:214; mapped to
  *                           Kafka `maxOffsetsPerTrigger`)
  * @param ttlMillis          idle-stream TTL before expiry
  *                           (`--ttl` 60s, cmd/serve.go:215)
  * @param bufferLimitBytes   per-stream in-memory byte budget with
  *                           drop-oldest eviction (`--buffer-limit`
  *                           100MB, cmd/serve.go:216)
  * @param triggerIntervalMs  micro-batch trigger ≈ the reference's 5 s
  *                           flush timer (kafka/consumer.go:319)
  * @param inferSampleSize    rows sampled for first-contact schema
  *                           inference (O5)
  * @param groupId            Kafka consumer group (`WithConsumerGroup`,
  *                           kafka/consumer.go:57-62)
  * @param startingOffsets    where a fresh subscription starts; the
  *                           reference pins `LastOffset`
  *                           (kafka/consumer.go:231) = Spark "latest"
  * @param minFetchBytes      Kafka fetch window floor (1 KB,
  *                           kafka/consumer.go:229)
  * @param maxFetchBytes      Kafka fetch window ceiling (10 MB,
  *                           kafka/consumer.go:230)
  */
final case class GraftConfig(
    batchSize: Int = 1024,
    ttlMillis: Long = 60000L,
    bufferLimitBytes: Long = 100L * 1024 * 1024,
    triggerIntervalMs: Long = 5000L,
    inferSampleSize: Int = Ingest.DefaultSampleSize,
    groupId: String = "graft",
    startingOffsets: String = "latest",
    minFetchBytes: Long = 1000L,
    maxFetchBytes: Long = 10L * 1000 * 1000) {
  require(batchSize > 0, "batchSize must be positive")
  require(bufferLimitBytes > 0, "bufferLimitBytes must be positive")
  require(ttlMillis > 0, "ttlMillis must be positive")
}

object GraftConfig {
  val Default: GraftConfig = GraftConfig()

  /** Parse the reference's duration flag syntax ("60s", "5m", "1h",
    * cmd/serve.go:215) to millis. */
  def parseDuration(s: String): Long = {
    val m = "^(\\d+)(ms|s|m|h)$".r.findFirstMatchIn(s.trim)
      .getOrElse(throw new IllegalArgumentException(s"bad duration: $s"))
    val n = m.group(1).toLong
    m.group(2) match {
      case "ms" => n
      case "s"  => n * 1000L
      case "m"  => n * 60000L
      case "h"  => n * 3600000L
    }
  }

  /** Parse the byte-size flag syntax ("100MB", "1GB" — the shape of
    * cmd/serve.go:216's --buffer-limit). BINARY multipliers (1 MB =
    * 2^20): the store budgets real heap bytes, so powers of two are
    * the honest unit — this intentionally reads ~5% larger than Go's
    * decimal humanize parse of the same string. Compound durations
    * ("1m30s") are likewise out of scope of parseDuration. */
  def parseBytes(s: String): Long = {
    val m = "^(\\d+)\\s*(B|KB|MB|GB)$".r.findFirstMatchIn(s.trim.toUpperCase)
      .getOrElse(throw new IllegalArgumentException(s"bad byte size: $s"))
    val n = m.group(1).toLong
    m.group(2) match {
      case "B"  => n
      case "KB" => n * 1024L
      case "MB" => n * 1024L * 1024L
      case "GB" => n * 1024L * 1024L * 1024L
    }
  }

  /** The reference's flag-shaped constructor: `--ttl 60s
    * --buffer-limit 100MB --batch-size 1024`. */
  def fromFlags(batchSize: Int = 1024, ttl: String = "60s",
                bufferLimit: String = "100MB"): GraftConfig =
    GraftConfig(batchSize = batchSize,
      ttlMillis = parseDuration(ttl),
      bufferLimitBytes = parseBytes(bufferLimit))
}
