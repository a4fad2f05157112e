package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion-parity queries (SURVEY.md §2c: q_json_infer, q_kafka_meta,
  * q_type_promotion). The `events` fixture plays the role of a Kafka
  * topic: `props` is the message payload, `ts`/`event_id` the broker
  * metadata. */
object IngestQueries {
  import Tables._

  /** JSON parse with inferred schema (reference O3/O5/O6,
    * kafka/consumer.go:827-982): sample-infer the payload schema once,
    * then one codegen'd from_json over the full table. At 100 TB the
    * sample is still ~100 rows; the parse is embarrassingly parallel. */
  def qJsonInfer(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
    val schema = Ingest.inferPayloadSchema(s, ev.select("props").as[String])
    Ingest.parseJsonPayload(ev, "props", schema, keep = Seq("event_id"))
      .orderBy("event_id")
  }

  /** Kafka-style metadata projection (reference O4,
    * kafka/consumer.go:833-839). */
  def qKafkaMeta(s: SparkSession, d: String): DataFrame =
    Ingest.kafkaMeta(events(s, d)).orderBy("kafka_offset")

  /** Per-row format sniffing (reference O2 detectMessageFormat,
    * kafka/consumer.go:651-665: JSON iff the payload starts with
    * '{'/'[' AND parses, else binary). Two deterministic corruption
    * classes exercise both rejection branches: every 7th payload gets
    * a stray leading byte (fails the prefix check) and every 11th a
    * doubled '{' (passes the prefix check but fails the parse — the
    * branch a prefix-only sniffer gets wrong). The try-parse is
    * `try_parse_json` (real parse returning NULL on malformed input —
    * `from_json` in PERMISSIVE mode never does); the whole classify
    * is one projection, no shuffle. */
  def qFormatSniff(s: SparkSession, d: String): DataFrame = {
    val payload = when(col("event_id") % 7 === 0, concat(lit("x"), col("props")))
      .when(col("event_id") % 11 === 0, concat(lit("{"), col("props")))
      .otherwise(col("props"))
    events(s, d)
      .select(col("event_id"), payload.as("payload"))
      .select(
        col("event_id"),
        when(col("payload").rlike("^\\s*[\\[{]") &&
          try_parse_json(col("payload")).isNotNull, "json")
          .otherwise("binary").as("format"))
      .orderBy("event_id")
  }

  /** Mixed-type promotion (reference O6 commonSuperType,
    * kafka/consumer.go:946-982): an int64-typed slice unioned with a
    * double-typed slice promotes to double via the lattice. */
  def qTypePromotion(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .select("event_id", "k")
    val ints    = ev.filter(col("event_id") % 2 === 0)
    val doubles = ev.filter(col("event_id") % 2 === 1)
      .withColumn("k", col("k") + 0.5)
    Ingest.unionPromote(ints, doubles).orderBy("event_id")
  }

  /** JSON scalar functions over the raw payload column (reference O3
    * value extraction, kafka/consumer.go:668-695, as per-row SQL
    * functions instead of whole-schema parse): path extraction,
    * typed cast, and a missing-path probe (null, matching the
    * reference's missing-field→null rule, consumer.go:630-634).
    * get_json_object is a codegen'd builtin — one text pass per row,
    * no shuffle. */
  def qJsonFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_num"),
        get_json_object(col("props"), "$.missing").as("absent"),
        get_json_object(col("props"), "$.missing").isNull.as("is_absent"))
      .orderBy("event_id")

  /** Schema evolution across file generations (reference O5/O6: later
    * messages with unknown fields are dropped field-wise, missing
    * fields become null, consumer.go:630-634): generation 1 lacks
    * `event_type`, generation 2 lacks `value`;
    * unionByName(allowMissingColumns) null-fills both — the exact
    * merge a partitioned lake does when a pipeline adds a column
    * mid-history. Catalyst plans it as a zero-shuffle union of two
    * pruned scans. */
  def qSchemaEvolution(s: SparkSession, d: String): DataFrame = {
    val gen1 = events(s, d).filter(col("event_id") % 2 === 0)
      .select("event_id", "user_id", "value")
    val gen2 = events(s, d).filter(col("event_id") % 2 === 1)
      .select("event_id", "user_id", "event_type")
    gen1.unionByName(gen2, allowMissingColumns = true)
      .orderBy("event_id")
  }

  /** URL parsing (parse_url — host/path/single query param): the
    * clickstream-ingest normalization step. URLs are synthesized
    * deterministically from event columns; the oracle re-derives the
    * same parts with regexes, so Spark's dedicated parser is checked
    * against an independent implementation. One codegen'd projection. */
  def qUrlParse(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        concat(lit("https://analytics.example.com/t/"), col("event_type"),
          lit("?user="), col("user_id").cast("string"),
          lit("&v="), (col("event_id") % 100).cast("string")).as("url"))
      .select(
        col("event_id"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("user")).as("user_param"),
        parse_url(col("url"), lit("QUERY"), lit("v")).as("v_param"))
      .orderBy("event_id")

  /** JSON array parsing + positional lateral explode — the array case
    * of reference O3 value extraction (the reference STRINGIFIES
    * arrays, consumer.go:937-939; we parse them properly). Payloads
    * are synthesized deterministically from event columns; from_json
    * with an array<string> schema then posexplode fans each row out
    * with ordinality. */
  def qJsonArrayExplode(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_id") < 2000)
      .select(col("event_id"),
        concat(lit("[\""), col("event_type"),
          lit("\",\"u"), col("user_id").cast("string"),
          lit("\",\"v"), (col("event_id") % 7).cast("string"),
          lit("\"]")).as("payload"))
      .select(col("event_id"),
        posexplode(from_json(col("payload"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType))))
      .select(col("event_id"), col("pos").cast("long").as("pos"),
        col("col").as("tag"))
      .orderBy("event_id", "pos")

  /** Semi-structured access through VariantType (Spark 4): parse the
    * payload ONCE into the binary variant encoding, then typed path
    * extraction (variant_get) — the engine-native form of schema-less
    * ingestion where the same parsed value serves many extractions
    * without re-tokenizing text. The reference's closest analog is
    * per-message json.Unmarshal into map[string]any
    * (kafka/consumer.go:680-687). Oracle replicates with DuckDB JSON
    * extraction. */
  def qVariantJson(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"), parse_json(col("props")).as("v"))
      .select(
        col("event_id"),
        variant_get(col("v"), "$.k", "bigint").as("k_long"),
        variant_get(col("v"), "$.k", "string").as("k_str"),
        try_variant_get(col("v"), "$.k", "bigint").isNotNull
          .cast("int").as("has_k"),
        try_variant_get(col("v"), "$.zzz", "bigint").isNotNull
          .cast("int").as("has_zzz"))
      .orderBy("event_id")

  /** Multi-format timestamp parsing — the messy-feed normalization
    * every ingest layer owns: each event's timestamp is FORMATTED
    * into one of four wire shapes (ISO-8601, US slash-date, compact
    * yyyyMMddHHmmss, epoch-seconds string) and parsed back with the
    * per-format parser, exercising Spark's `to_timestamp` pattern
    * machinery against DuckDB's `strptime` — two independent format
    * engines that must land on the identical instant. Output is the
    * per-format roundtrip audit in epoch seconds (timestamp-typed
    * outputs draw the ns/µs dtype warning — the q_stream_tumbling
    * lesson). Map-side projection into a 4-group aggregate. */
  def qDatetimeParse(s: SparkSession, d: String): DataFrame = {
    val ts = col("ts")
    val formatted = events(s, d)
      .select(col("event_id"), (col("event_id") % 4).as("fmt"), ts)
      .withColumn("raw",
        when(col("fmt") === 0, date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"))
          .when(col("fmt") === 1, date_format(ts, "MM/dd/yyyy HH:mm:ss"))
          .when(col("fmt") === 2, date_format(ts, "yyyyMMddHHmmss"))
          .otherwise(unix_timestamp(ts).cast("string")))
    formatted
      .withColumn("parsed",
        when(col("fmt") === 0,
          to_timestamp(col("raw"), "yyyy-MM-dd'T'HH:mm:ss"))
          .when(col("fmt") === 1, to_timestamp(col("raw"), "MM/dd/yyyy HH:mm:ss"))
          .when(col("fmt") === 2, to_timestamp(col("raw"), "yyyyMMddHHmmss"))
          .otherwise(to_timestamp(col("raw").cast("long"))))
      .select(col("fmt").cast("long").as("fmt"),
        unix_timestamp(col("parsed")).as("epoch_s"),
        (unix_timestamp(col("parsed")) === unix_timestamp(ts))
          .cast("long").as("ok"))
      .groupBy("fmt")
      .agg(count(lit(1)).as("n"), sum("ok").as("n_roundtrip_ok"),
        min("epoch_s").as("min_epoch"), max("epoch_s").as("max_epoch"))
      .orderBy("fmt")
  }

  /** Robust numeric-string parsing — the "$1,234.56", "(45.10)",
    * padded-whitespace mess a finance feed actually ships: amounts
    * are RENDERED from exact integer cents into five wire shapes
    * (plain, currency-prefixed, padded, parenthesized-negative,
    * comma-grouped — the grouping built by string surgery on the
    * integer, so both engines synthesize identical bytes), then
    * parsed back by stripping/sign logic into cents. The oracle
    * renders and parses with its own string functions; the per-shape
    * sums must agree to the cent. One projection, 5-group
    * aggregate. */
  def qNumParse(s: SparkSession, d: String): DataFrame = {
    val cents = floor(col("value") * 100.0 + 0.5).cast("long")
    val base = events(s, d)
      .select(col("event_id"), (col("event_id") % 5).as("shape"),
        cents.as("c"))
      // div, not `/`: Column./ on longs is DOUBLE division, and the
      // "12.3"-shaped string it renders would corrupt the wire format
      .withColumn("dollars", expr("c div 100").cast("string"))
      .withColumn("frac", lpad((col("c") % 100L).cast("string"), 2, "0"))
      .withColumn("plain", concat(col("dollars"), lit("."), col("frac")))
      .withColumn("grouped",
        when(length(col("dollars")) > 3,
          concat(col("dollars").substr(lit(1), length(col("dollars")) - 3),
            lit(","),
            col("dollars").substr(length(col("dollars")) - 2, lit(3)),
            lit("."), col("frac")))
          .otherwise(col("plain")))
      .withColumn("raw",
        when(col("shape") === 0, col("plain"))
          .when(col("shape") === 1, concat(lit("$"), col("plain")))
          .when(col("shape") === 2, concat(lit("  "), col("plain"), lit(" ")))
          .when(col("shape") === 3, concat(lit("("), col("plain"), lit(")")))
          .otherwise(col("grouped")))
    base
      .withColumn("neg", col("raw").contains("(").cast("long"))
      .withColumn("clean",
        regexp_replace(col("raw"), "[$,()\\s]", ""))
      .withColumn("parsed_c",
        (lit(1L) - lit(2L) * col("neg")) *
          (split(col("clean"), "\\.").getItem(0).cast("long") * 100L +
            split(col("clean"), "\\.").getItem(1).cast("long")))
      .groupBy(col("shape").cast("long").as("shape"))
      .agg(count(lit(1)).as("n"),
        sum("parsed_c").as("sum_parsed_c"),
        sum((col("parsed_c") === (lit(1L) - lit(2L) * col("neg")) * col("c"))
          .cast("long")).as("n_exact"))
      .orderBy("shape")
  }

  /** User-agent string parsing — the clickstream-enrichment step
    * between raw logs and any device report: full Mozilla-style UA
    * strings are synthesized from event columns (three OS platforms,
    * two browser families with versions), then DISSECTED back with
    * regexes into OS family, browser family and major version. Spark
    * (Java regex) and DuckDB (RE2) each run their own extraction —
    * the same pattern text, two regex engines that must cut identical
    * substrings. Map-side projection into a small-group aggregate. */
  def qUaParse(s: SparkSession, d: String): DataFrame = {
    val os = when(col("user_id") % 3 === 0, lit("Windows NT 10.0; Win64; x64"))
      .when(col("user_id") % 3 === 1, lit("Macintosh; Intel Mac OS X 10_15_7"))
      .otherwise(lit("X11; Linux x86_64"))
    val browser = when(col("event_id") % 2 === 0,
      concat(lit("Chrome/"), (lit(100L) + col("event_id") % 30).cast("string"),
        lit(".0.0.0 Safari/537.36")))
      .otherwise(concat(lit("Firefox/"),
        (lit(100L) + col("event_id") % 30).cast("string"), lit(".0")))
    val ua = concat(lit("Mozilla/5.0 ("), os,
      lit(") AppleWebKit/537.36 (KHTML, like Gecko) "), browser)
    events(s, d)
      .select(ua.as("ua"))
      .select(
        regexp_extract(col("ua"), "\\((Windows|Macintosh|X11)[^)]*\\)", 1)
          .as("os_family"),
        regexp_extract(col("ua"), "(Chrome|Firefox)/", 1).as("browser"),
        regexp_extract(col("ua"), "(?:Chrome|Firefox)/(\\d+)", 1)
          .cast("long").as("major"))
      .groupBy("os_family", "browser", "major")
      .agg(count(lit(1)).as("n"))
      .orderBy("os_family", "browser", "major")
  }
}
