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

  /** Dotted config keys ↔ case-class fields — the same paths the
    * reference's config.yaml nests (config/config.yaml: kafka.*,
    * stream.*) plus the consumer knobs its code hardcodes. */
  private val Keys: Seq[String] = Seq(
    "kafka.batch_size", "stream.ttl", "stream.buffer_limit",
    "stream.trigger_interval", "stream.infer_sample_size",
    "kafka.group_id", "kafka.starting_offsets",
    "kafka.min_fetch_bytes", "kafka.max_fetch_bytes")

  /** Parse the MINIMAL yaml shape the reference's config.yaml uses —
    * two-level `section:` / `  key: value` nesting with comments and
    * optional quotes — into dotted keys. List items and deeper
    * nesting are skipped (none of the mapped knobs live there). No
    * yaml dependency: the offline distribution has none, and this
    * covers the file's actual grammar. */
  def parseYamlish(text: String): Map[String, String] = {
    var section = ""
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    text.linesIterator.foreach { raw =>
      val noComment = raw.takeWhile(_ != '#')
      val line = noComment.replaceAll("\\s+$", "")
      if (line.nonEmpty && !line.trim.startsWith("-")) {
        val indented = line.startsWith(" ") || line.startsWith("\t")
        line.trim.split(":", 2) match {
          case Array(k, v) if v.trim.isEmpty && !indented =>
            section = k.trim
          case Array(k, v) if v.trim.nonEmpty =>
            val key = if (indented && section.nonEmpty) s"$section.${k.trim}" else k.trim
            out(key) = v.trim.stripPrefix("\"").stripSuffix("\"")
          case _ => // bare nested section or malformed: skip
        }
      }
    }
    out.toMap
  }

  /** Viper-style env name for a dotted key: upper-cased, dots →
    * underscores (the reference calls AutomaticEnv with no prefix —
    * `stream.ttl` reads STREAM_TTL). */
  def envName(key: String): String = key.replace('.', '_').toUpperCase

  private def applyKey(c: GraftConfig, key: String, v: String): GraftConfig =
    key match {
      case "kafka.batch_size"         => c.copy(batchSize = v.trim.toInt)
      case "stream.ttl"               => c.copy(ttlMillis = parseDuration(v))
      case "stream.buffer_limit"      => c.copy(bufferLimitBytes = parseBytes(v))
      case "stream.trigger_interval"  => c.copy(triggerIntervalMs = parseDuration(v))
      case "stream.infer_sample_size" => c.copy(inferSampleSize = v.trim.toInt)
      case "kafka.group_id"           => c.copy(groupId = v.trim)
      case "kafka.starting_offsets"   => c.copy(startingOffsets = v.trim)
      case "kafka.min_fetch_bytes"    => c.copy(minFetchBytes = v.trim.toLong)
      case "kafka.max_fetch_bytes"    => c.copy(maxFetchBytes = v.trim.toLong)
      case _                          => c // unknown keys are ignored, as viper does
    }

  /** The reference's full layering (cmd/root.go:48-74): defaults (or
    * flag-built base) < config FILE < ENV — viper resolves
    * AutomaticEnv above the file, so an env var overrides the same
    * key from yaml. Unknown file keys are ignored; env is consulted
    * per mapped key only. */
  def layered(base: GraftConfig = Default,
              fileText: Option[String] = None,
              env: Map[String, String] = sys.env): GraftConfig = {
    val fromFile = fileText.map(parseYamlish).getOrElse(Map.empty)
    val afterFile = Keys.foldLeft(base) { (c, k) =>
      fromFile.get(k).map(applyKey(c, k, _)).getOrElse(c)
    }
    Keys.foldLeft(afterFile) { (c, k) =>
      env.get(envName(k)).map(applyKey(c, k, _)).getOrElse(c)
    }
  }
}
