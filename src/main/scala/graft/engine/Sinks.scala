package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File sinks with the reference's client-side formatting rules
  * (cmd/client.go:227-277): CSV with header, nulls as empty fields,
  * fields quoted when they contain commas. Parquet is the default
  * analytical sink (schema self-describing, splittable — what the
  * reference's DuckDB sink becomes at scale). */
object Sinks {

  /** Write CSV with the reference's quoting/null conventions
    * (cmd/client.go:249-257: quote iff field contains a comma; nulls →
    * empty). Spark's CSV writer QUOTE_MINIMAL is exactly that rule. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("emptyValue", "")
      .option("nullValue", "")
      .csv(path)

  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "")
      .option("multiLine", "true") // quoted embedded newlines
      .schema(schema)
      .csv(path)

  /** Partitioned parquet sink: directory layout by partition column(s)
    * — the 100 TB default. Readers filtering on the partition column
    * prune directories at planning time (`PartitionFilters` in the
    * scan, proven in SinksSpec); a date/topic partition scheme turns
    * full scans into touched-partition scans. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** JSON-lines sink/source round-trip (schema-explicit read — JSON
    * inference on read is a sampling scan; at scale the schema rides
    * the catalog, not re-inference). */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJsonLines(spark: SparkSession, path: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  import Tables._

  /** Scratch paths are suffixed with the JVM pid: verify and bench (or
    * parallel test JVMs) running concurrently must never Overwrite a
    * directory out from under each other's read. */
  private val pid = ProcessHandle.current().pid()

  /** CSV round-trip self-check (SURVEY.md §2c q_csv_roundtrip): write
    * documents enriched with a quoting-hostile column (commas, quotes,
    * newlines) to CSV, read it back with the same schema, join on
    * doc_id and emit per-row match flags. Self-checking: the ScalaTest
    * spec asserts all_match = true; the driver's rows>0 check passes
    * either way. */
  def qCsvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val src = documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        concat(lit("a,b \"q\" "), col("lang"), lit("\nline2")).as("tricky"))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_csv_roundtrip_$pid"
    writeCsv(src, path)
    val back = readCsv(s, path, src.schema)
    src.alias("a")
      .join(back.alias("b"), Seq("doc_id"))
      .select(
        col("doc_id"),
        (col("a.lang") === col("b.lang") &&
          col("a.n_chars") === col("b.n_chars") &&
          col("a.tricky") === col("b.tricky")).as("row_match"))
      .orderBy("doc_id")
  }

  /** JSON-lines sink/scan roundtrip: unlike CSV this carries an ARRAY
    * column and exact doubles/timestamps natively (the reference
    * stringifies nested values, kafka/consumer.go:934-939 — JSONL is
    * where we exceed it). Timestamps serialize at µs precision;
    * doubles round-trip via shortest-repr JSON numbers; the token
    * array survives as a real JSON array. Splittable-format note for
    * 100 TB: JSONL shards stay line-splittable, so the re-read
    * parallelizes like the original write. */
  def qJsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val src = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("value"),
        split(col("event_type"), "").as("type_chars"),
        concat(lit("unicode é中 \"quoted\" \\ "), col("event_type")).as("tricky"))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_json_roundtrip_$pid"
    src.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)
    val back = s.read.schema(src.schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)
    src.alias("a").join(back.alias("b"), Seq("event_id"))
      .select(
        col("event_id"),
        (col("a.ts") === col("b.ts") &&
          col("a.value") === col("b.value") &&
          col("a.tricky") === col("b.tricky") &&
          col("a.type_chars") === col("b.type_chars")).as("row_match"))
      .orderBy("event_id")
  }

  /** One partitioned copy per (JVM, sfDir), written on first use: the
    * write is table prep (done once per dataset at scale), not part of
    * the repeated query — memoizing keeps timed reruns measuring the
    * pruned scan, and the pid suffix keeps concurrent JVMs apart. */
  private val partitionedCopies =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def ensurePartitionedEvents(s: SparkSession, d: String): String =
    partitionedCopies.computeIfAbsent(d, _ => {
      val path = StagedPaths.tmp("graft_partition_prune")
      writePartitioned(
        Tables.events(s, d).select("event_id", "ts", "user_id", "event_type", "value"),
        path, "event_type")
      path
    })

  /** One ORC copy of lineitem per (JVM, sfDir) — same table-prep
    * memoization as the partitioned events copy. */
  private val orcCopies =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def ensureOrcLineitem(s: SparkSession, d: String): String =
    orcCopies.computeIfAbsent(d, _ => {
      val path = StagedPaths.tmp("graft_orc")
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_extendedprice",
          "l_returnflag", "l_linestatus", "l_shipdate")
        .write.mode("overwrite").orc(path)
      path
    })

  /** ORC sink + scan round-trip: land lineitem as ORC, read it back,
    * and run the classic pricing-summary aggregate with the date
    * filter pushed into the ORC reader (ORC keeps min/max stripe
    * statistics, so the pushed predicate skips whole stripes — same
    * pruning story as parquet row groups). The DuckDB oracle computes
    * the identical aggregate from the parquet fixture: matching
    * hashes prove the format conversion is value-preserving. */
  def qOrcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = ensureOrcLineitem(s, d)
    s.read.orc(path)
      .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val avroCopies = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Land orders as Avro container files once per (JVM, sf) via the
    * engine's own connector ([[graft.sources.AvroSink]]). */
  def ensureAvroOrders(s: SparkSession, d: String): String =
    avroCopies.computeIfAbsent(d, _ => {
      val path = StagedPaths.tmp("graft_avro")
      graft.sources.AvroSink.write(
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents")),
        path)
      path
    })

  /** Avro sink + scan round-trip through the graft-avro DataSource V2
    * connector (the spark-avro module is absent offline; this is the
    * engine's own avro-core-based format — container files written
    * per-partition, schema inferred from the container header, column
    * pruning honored by the reader). Money rides as integer cents, so
    * the DuckDB oracle recomputing from the parquet fixture pins the
    * round-trip bit-exactly. */
  def qAvroRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = ensureAvroOrders(s, d)
    s.read.format("graft-avro").option("path", path).load()
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        sum("cents").as("sum_cents"),
        max("o_orderkey").as("max_key"))
      .orderBy("priority")
  }

  /** Partition-pruned scan end-to-end: land events partitioned by
    * event_type (the 100 TB layout — one directory per type), then
    * aggregate two types. The filter is a partition filter, so the
    * scan plans only 2 of 5 directories (`PartitionFilters` in the
    * physical scan, asserted in SinksSpec) — at scale this reads 40%
    * of the table without touching a data page of the rest. The
    * oracle runs the same aggregate on the unpartitioned fixture:
    * identical results prove the layout is semantics-preserving. */
  def qPartitionPrune(s: SparkSession, d: String): DataFrame = {
    val path = ensurePartitionedEvents(s, d)
    s.read.parquet(path)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("total_value"),
        countDistinct("user_id").as("n_users"))
      .orderBy("event_type")
  }

  /** Dynamic partition pruning evidence — the join-driven pruning
    * that makes star joins cheap on a partitioned 100 TB fact table:
    * the partition filter is NOT in the query text (only the dim
    * side's `category = 'conversion'` predicate is); Spark must
    * derive it AT RUNTIME from the broadcast dim and inject it into
    * the partitioned scan. The query REQUIRES the executed plan to
    * carry a `dynamicpruning` partition filter (the FlightServe
    * plan-assert convention) — if a config regression ever turns DPP
    * off, the query fails rather than silently scanning every
    * partition. Result shape is a plain join-aggregate the oracle
    * replays on the raw table. */
  private val dppDimCopies =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def qDppJoin(s: SparkSession, d: String): DataFrame = {
    val path = ensurePartitionedEvents(s, d)
    val spark = s
    import spark.implicits._
    // The dim must be a REAL scan: a literal LocalRelation constant-folds
    // its filter away during optimization and DPP then sees no selective
    // predicate on the filtering side — staged once per (JVM, sfDir).
    val dimPath = dppDimCopies.computeIfAbsent(d, _ => {
      val p = StagedPaths.tmp("graft_dpp_dim")
      Seq(
        ("purchase", "conversion"), ("signup", "conversion"),
        ("click", "engagement"), ("view", "engagement"), ("error", "ops"))
        .toDF("event_type", "category")
        .coalesce(1).write.mode("overwrite").parquet(p)
      p
    })
    val dim = s.read.parquet(dimPath)
    val out = s.read.parquet(path)
      .join(dim.filter(col("category") === "conversion"), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct("user_id").as("n_users"),
        sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("value_c"))
      .orderBy("event_type")
    val plan = out.queryExecution.executedPlan.toString
    require(plan.toLowerCase.contains("dynamicpruning"),
      "partitioned scan must carry a runtime DPP filter, got:\n" + plan.take(2000))
    out
  }

  /** Fixed-width (copybook-style) text sink + parse roundtrip — the
    * mainframe/legacy-feed ingestion format every lakehouse migration
    * eventually meets. Encode: one `concat(lpad/rpad(...))` projection
    * per row into `format("text")` (map-side, splittable lines, no
    * shuffle). Decode: `substring` column carving + casts — all
    * codegen'd builtins, so the parse runs inside WholeStageCodegen
    * like a CSV scan would. The aggregate compares against the
    * original table through the DuckDB oracle: any column drift,
    * padding bug, or cents truncation breaks the hash. Money rides as
    * zero-padded integer cents (exact), dates as ISO-8601 text. */
  def qFixedWidth(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d).select(
      col("o_orderkey"), col("o_orderstatus"),
      expr("CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("dt"))
    val line = concat(
      lpad(col("o_orderkey").cast("string"), 12, "0"),
      rpad(col("o_orderstatus"), 1, " "),
      lpad(col("cents").cast("string"), 14, "0"),
      col("dt"))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fixed_width_$pid"
    src.select(line.as("value")).write.mode(SaveMode.Overwrite).text(path)
    s.read.text(path)
      .select(
        substring(col("value"), 1, 12).cast("long").as("okey"),
        substring(col("value"), 13, 1).as("status"),
        substring(col("value"), 14, 14).cast("long").as("cents"),
        substring(col("value"), 28, 10).as("dt"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_orders"),
        sum("cents").as("sum_cents"),
        min("okey").as("min_key"),
        max("dt").as("max_date"))
      .orderBy("status")
  }
}
