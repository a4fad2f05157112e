package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}
import org.apache.spark.sql.types.StructType

/** Streaming semantics (reference O9 micro-batching, O12 bounded
  * buffer, O14 TTL) re-expressed on Structured Streaming.
  *
  * Each query below is written against the batch DataFrame API with
  * constructs (`window`, `session_window`, watermarks) that run
  * IDENTICALLY under `readStream` — `streamingTumbling` below wires
  * the same aggregation to an actual streaming source, and the
  * ScalaTest suite drives it with a MemoryStream. The batch form is
  * what the DuckDB oracle replays (SURVEY.md §2c).
  */
object StreamingOps {
  import Tables._

  /** Chained event-time aggregation (Spark 3.4+ multi-stateful-op
    * support): hourly windows aggregate raw events, then a SECOND
    * window() over the hourly window column rolls them up to days —
    * in streaming, both stages keep watermark-bounded state and the
    * daily row only emits once its hours are final. The batch form
    * here is bit-identical; the daily stage's input is the hourly
    * aggregate (|hours|×|types| rows), so the second shuffle is
    * calendar-sized at any event volume. */
  def qStreamChained(s: SparkSession, d: String): DataFrame =
    streamingChained(events(s, d)).orderBy("day_start", "event_type")

  /** Event-time tumbling window + watermark (reference O9's 5s flush
    * timer generalized to event time). Output keyed by epoch seconds so
    * both engines hash identically. The groupBy(window) shuffles on
    * (window, event_type) — bounded keys per hour, scales with time
    * range not data volume; partial aggregation keeps the shuffle tiny. */
  def qStreamTumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** Idle-gap sessionization — the event-time analog of the reference's
    * processing-time stream TTL (stream/manager.go:150-184: a stream
    * "session" dies after 60s idle; here a user session closes after 4h
    * idle). session_window keeps per-key state bounded by the watermark
    * at scale. */
  def qStreamSessionTtl(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "4 hours"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")

  /** Sliding event-time windows (1h window, 30min slide): each event
    * lands in exactly 2 overlapping windows. Spark expands the slide
    * executor-side before the aggregation, so the shuffle still
    * carries only (window, type, partial-agg) rows. Runs identically
    * under readStream with the same watermark. */
  def qStreamSliding(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** Watermark late-data semantics, batch-replayable: an event is
    * "late" if it arrives (arrival order = event_id) after the
    * per-user high-water mark has advanced more than the allowed
    * lateness past its event time — exactly the row a streaming
    * aggregation with that watermark would drop. Running max over a
    * keyed window: one shuffle on user_id, no global sort. */
  def qStreamLateDrop(s: SparkSession, d: String,
                      latenessUs: Long = 600000000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    events(s, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("hwm_us", max("us").over(w))
      .select(
        col("event_id"), col("user_id"),
        (col("us") < col("hwm_us") - latenessUs).cast("int").as("is_late"))
      .orderBy("event_id")
  }

  /** Batch replay of the streaming exact-dedup (streamingDedup below
    * runs the same dropDuplicates plan under a watermark): the event
    * stream is doubled (every row re-delivered, the at-least-once
    * redelivery failure mode), dedup keeps one row per event_id.
    * dropDuplicates plans as a hash aggregate on the key — partial
    * map-side, one shuffle on event_id. */
  def qStreamDedup(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select("event_id", "user_id", "value")
    ev.unionByName(ev)
      .dropDuplicates("event_id")
      .orderBy("event_id")
  }

  /** Drop-oldest bounded-buffer semantics (reference O12,
    * stream/manager.go:286-310): keep only the newest 50 events per
    * user. row_number over (user, ts desc) mirrors byte-budget eviction
    * with a row budget. Ranking runs after µs truncation so the oracle
    * ranks the same values. */
  def qBufferEviction(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 50)
      .select("event_id", "user_id")
      .orderBy("event_id")
  }

  /** Time-series resample + forward fill: each user's event stream is
    * regularized onto an hourly grid between their first and last
    * event; empty cells take the last observed hourly average
    * (`last(ignoreNulls)` over an unbounded-preceding frame = LOCF).
    * The grid explode fans out on the executor holding the user's
    * bounds row; the fill is one window shuffle on user_id. Grid size
    * is bounded by (span-hours × users), independent of event count —
    * the property that makes resampling viable when raw events are
    * 100 TB but the grid is millions of cells. */
  def qResampleFfill(s: SparkSession, d: String): DataFrame = {
    // hourly SUM, not avg: avg of 2-decimal values lands exactly on
    // the .xx5 round-half boundary where Spark (decimal HALF_UP) and
    // DuckDB (binary) disagree; a sum of 2-decimal values stays ~1e-12
    // from a 2-decimal rational, so ROUND(…, 2) is stable cross-engine
    val hourly = events(s, d)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(round(sum("value"), 2).as("v"))
    val grid = hourly.groupBy("user_id")
      .agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("hour")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("v_filled", last("v", ignoreNulls = true).over(w))
      .select(
        col("user_id"),
        unix_timestamp(col("hour")).as("hour_start"),
        col("v_filled"),
        col("v").isNull.cast("int").as("is_gap"))
      .orderBy("user_id", "hour_start")
  }

  /** Batch replay of the stream-stream interval join
    * (`streamingIntervalJoin` below is the same plan under
    * watermarks): each click pairs with the same user's purchases in
    * the following 30 minutes. The equi-key (user_id) drives one hash
    * shuffle; the time bound is a residual predicate evaluated inside
    * the matched bucket — never a cross product. In streaming form
    * the 30-minute bound plus watermark caps both sides' join state. */
  def qStreamJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 30 minutes"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("lag_secs"))
      .orderBy("click_id", "purchase_id")
  }

  /** Batch replay of the stream-stream LEFT OUTER interval join
    * (`streamingOuterIntervalJoin` below runs the same plan under
    * watermarks): every click appears — paired with each purchase by
    * the same user in the following 30 minutes, or once with null
    * markers (-1) if none came. The outer side is what makes the
    * streaming form hard: a click can only be emitted unmatched once
    * the watermark proves no purchase can still arrive, which is
    * exactly the state bound the interval condition provides. Nulls
    * are COALESCEd to -1 sentinels so ordering is engine-portable
    * (ASC null placement differs between Spark and DuckDB). */
  def qStreamOuterJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("p_event_id"),
        col("ts").as("purchase_ts"))
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 30 minutes"),
        "left")
      .select(col("click_id"),
        coalesce(col("p_event_id"), lit(-1L)).as("purchase_id"),
        col("user_id"),
        when(col("p_event_id").isNull, lit(-1L))
          .otherwise(unix_timestamp(col("purchase_ts"))
            - unix_timestamp(col("click_ts"))).as("lag_secs"))
      .orderBy("click_id", "purchase_id")
  }

  /** FULL OUTER stream-stream interval join, batch replay: clicks and
    * purchases both survive unmatched (click with no purchase in its
    * 30-minute window, purchase with no prior click). Same interval
    * condition as q_stream_outer_join, so state stays bounded in the
    * streaming form; the -1 sentinels keep the output schema
    * null-free for the hash compare. */
  def qStreamFullOuter(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("p_event_id"),
        col("ts").as("purchase_ts"))
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 30 minutes"),
        "full_outer")
      .select(
        coalesce(col("click_id"), lit(-1L)).as("click_id"),
        coalesce(col("p_event_id"), lit(-1L)).as("purchase_id"),
        coalesce(col("user_id"), col("p_user_id")).as("uid"),
        when(col("click_id").isNull, lit("purchase_only"))
          .when(col("p_event_id").isNull, lit("click_only"))
          .otherwise(lit("matched")).as("side"))
      .orderBy("click_id", "purchase_id", "uid")
  }

  /** Stream-stream FULL OUTER interval join with bounded state — the
    * streaming form of qStreamFullOuter (Spark supports fullOuter
    * stream-stream joins since 3.1; both sides' state is released
    * once the watermark passes the interval bound). Driven by
    * MemoryStream in StreamingSpec. */
  def streamingFullOuterIntervalJoin(clicks: DataFrame, purchases: DataFrame,
                                     watermark: String = "1 hour",
                                     interval: String = "30 minutes"): DataFrame =
    clicks.withWatermark("click_ts", watermark)
      .join(purchases.withWatermark("purchase_ts", watermark),
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $interval"),
        "fullOuter")
      .select(col("click_id"), col("purchase_id"),
        coalesce(col("user_id"), col("p_user_id")).as("uid"))

  /** Stream-stream LEFT OUTER interval join with bounded state: same
    * condition as streamingIntervalJoin, outer on the click side.
    * Unmatched clicks are emitted with nulls only after the watermark
    * passes click_ts + interval (no earlier — correctness — and no
    * later — state release). */
  def streamingOuterIntervalJoin(clicks: DataFrame, purchases: DataFrame,
                                 watermark: String = "1 hour",
                                 interval: String = "30 minutes"): DataFrame =
    clicks.withWatermark("click_ts", watermark)
      .join(purchases.withWatermark("purchase_ts", watermark),
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $interval"),
        "leftOuter")
      .select(col("click_id"), col("purchase_id"), col("user_id"))

  /** Stream-stream inner join with bounded state: both sides
    * watermarked, join condition = equi-key + event-time interval.
    * Spark derives each side's state retention from the time bound —
    * click state lives `interval` past the watermark, purchase state
    * is dropped as soon as the watermark passes (the condition admits
    * no future clicks). Without the interval the state would grow
    * without bound — the exact failure the reference's TTL eviction
    * (stream/manager.go:150-184) guards against, solved here in event
    * time. Driven by MemoryStream in StreamingSpec. */
  def streamingIntervalJoin(clicks: DataFrame, purchases: DataFrame,
                            watermark: String = "1 hour",
                            interval: String = "30 minutes"): DataFrame =
    clicks.withWatermark("click_ts", watermark)
      .join(purchases.withWatermark("purchase_ts", watermark),
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $interval"))
      .select(col("click_id"), col("purchase_id"), col("user_id"))

  /** The real streaming pipeline for the tumbling aggregation: same
    * plan as qStreamTumbling but fed from any streaming DataFrame
    * (MemoryStream in tests, Kafka source in production). */
  def streamingTumbling(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming form of qStreamChained: two stateful window
    * aggregations in one query (hour → day). Append mode — a daily
    * row emits only after the watermark closes all of its hourly
    * windows, which is exactly the multi-stateful-operator semantics
    * Spark 3.4 added (window() applied to the upstream window
    * column). */
  def streamingChained(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("v"))
      .groupBy(window(col("window"), "1 day"), col("event_type"))
      .agg(
        sum("n_events").cast("long").as("n_events"),
        max("n_events").cast("long").as("peak_hour_events"),
        count(lit(1)).as("n_hours"),
        round(sum("v"), 2).as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("day_start"),
        col("event_type"), col("n_events"), col("peak_hour_events"),
        col("n_hours"), col("total_value"))

  /** Stream-static enrichment: the streaming fact joins a STATIC
    * dimension (customer → market segment) before a watermarked
    * hourly rollup — the canonical "enrich then aggregate" streaming
    * topology (Spark re-plans the static side per micro-batch; no
    * state is kept for it, unlike a stream-stream join). The join is
    * LEFT so an unmatched stream key degrades to an UNKNOWN segment
    * instead of dropping revenue. No broadcast hint — the dim is
    * corpus-scaled at 100 TB and AQE broadcasts when it actually
    * fits. Cents are exact integers end to end. */
  def streamingEnrich(stream: DataFrame, dim: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "1 hour")
      .join(dim.select(col("c_custkey").as("user_id"),
        col("c_mktsegment")), Seq("user_id"), "left")
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
        col("n"), col("cents"))

  /** Batch replay of [[streamingEnrich]] for the DuckDB differential
    * (events.user_id is a customer key in the fixtures). */
  def qStreamEnrich(s: SparkSession, d: String): DataFrame =
    streamingEnrich(events(s, d), customer(s, d))
      .orderBy("window_start", "segment")

  /** Streaming CDC apply — the `foreachBatch` MERGE sink every
    * lakehouse pipeline runs when the table format has no native
    * upsert: each micro-batch of change rows (key, seq, op, payload)
    * merges last-wins into a keyed parquet state, delete ops drop
    * the key. State versions are APPEND-ONLY (`v<epoch>` dirs, the
    * latest is current) so a crashed epoch can never half-overwrite
    * the previous state — re-running the epoch just rewrites its
    * version, giving idempotent exactly-once state per epoch on top
    * of the checkpointed offsets. The per-key last-wins rule is the
    * same (seq desc) total order as the batch q_cdc_upsert, so the
    * spec asserts stream-applied state ≡ the batch rewrite of the
    * full change log. */
  def cdcApply(changes: DataFrame, statePath: String,
               checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val spark = batch.sparkSession
        val prev = latestCdcState(spark, statePath)
        // keep the winning row PER KEY including delete tombstones —
        // dropping a tombstone from state would let a late lower-seq
        // row resurrect the key in a later epoch; reads filter them
        val merged = prev.map(_.unionByName(batch)).getOrElse(batch)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("key")
              .orderBy(col("seq").desc)))
          .filter(col("rn") === 1)
          .drop("rn")
        merged.write.mode("overwrite")
          .parquet(s"$statePath/v$epochId")
        ()
      }
      .start()

  /** The current CDC state: highest v<epoch> version dir, if any. */
  def latestCdcState(spark: SparkSession, statePath: String): Option[DataFrame] = {
    val dir = new java.io.File(statePath)
    val versions = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .flatMap(f => scala.util.Try(f.getName.drop(1).toLong).toOption
        .map(_ -> f))
    if (versions.isEmpty) None
    else Some(spark.read.parquet(versions.maxBy(_._1)._2.getPath))
  }

  /** The live CDC view: current state minus delete tombstones. */
  def currentCdcView(spark: SparkSession, statePath: String): Option[DataFrame] =
    latestCdcState(spark, statePath).map(_.filter(col("op") =!= "delete"))

  /** Input/output rows for the stateful TTL sessionizer. */
  final case class SessionEvent(key: String, ts: java.sql.Timestamp, value: Double)
  final case class SessionUpdate(key: String, n_events: Long,
                                 total_value: Double, expired: Boolean)
  // not private: the state encoder's generated code must access it
  final case class SessionState(n: Long, total: Double, lastTs: Long)

  /** Custom-state session TTL via flatMapGroupsWithState — the
    * reference's O14 lifecycle (stream/manager.go:150-184: a stream's
    * state is emitted and freed after `ttl` of idleness). Per-key
    * state is distributed across executors and checkpointed — the
    * scale path for the reference's driver-local TTL map.
    *
    * Two clock modes:
    *  - event time (default): idle = no events within `ttlMs` of the
    *    key's max event time, measured against the watermark.
    *    Deterministic, replayable, the 100 TB-correct form.
    *  - processing time (`eventTime = false`): wall-clock idleness —
    *    the reference's literal semantics. CAVEAT verified empirically:
    *    once any processing-time timeout is registered the engine
    *    self-triggers batches continuously to evaluate it, and
    *    `processAllAvailable` can block — fine on a real trigger
    *    interval, hostile to deterministic tests. */
  def statefulSessionize(events: Dataset[SessionEvent], ttlMs: Long,
                         eventTime: Boolean = true): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val timeoutKind =
      if (eventTime) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    val src = if (eventTime) events.withWatermark("ts", "0 seconds") else events
    src
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, timeoutKind) {
        (key: String, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle TTL fired: emit the closed session, release state
            // (the reference logs + frees the stream here)
            val s = state.get
            state.remove()
            Iterator(SessionUpdate(key, s.n, s.total, expired = true))
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            var n = prev.n; var total = prev.total; var lastTs = prev.lastTs
            rows.foreach { e =>
              n += 1; total += e.value
              lastTs = math.max(lastTs, e.ts.getTime)
            }
            state.update(SessionState(n, total, lastTs))
            if (eventTime) state.setTimeoutTimestamp(lastTs + ttlMs)
            else state.setTimeoutDuration(ttlMs)
            Iterator(SessionUpdate(key, n, total, expired = false))
          }
      }
  }

  /** Cross-batch streaming exact dedup: dropDuplicates over a
    * watermarked stream keeps per-key state only until the watermark
    * passes (bounded state — the property that makes streaming dedup
    * viable at 100 TB; unbounded dropDuplicates would accumulate every
    * key ever seen). Keys arriving again within the watermark window
    * are suppressed; the first occurrence wins. */
  def streamingDedup(stream: DataFrame, keyCol: String,
                     tsCol: String, watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Streaming near-duplicate filter for a document stream: each doc
    * is reduced to its winnowing fingerprint (min shingle hash —
    * TextOps) and documents whose fingerprint was already seen within
    * the watermark are dropped. Near-dup recall per pair equals the
    * probability the pair shares its min shingle — exactly its
    * Jaccard similarity (the MinHash estimator with one hash), so
    * small edits are usually caught; raise to a k-min sketch column
    * for higher recall. State bounded by the watermark. */
  def streamingNearDupFilter(docs: DataFrame, tsCol: String, textCol: String,
                             watermark: String): DataFrame =
    docs
      .withColumn("fp", array_min(TextOps.shingleHashes(TextOps.tokens(col(textCol)), 3)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  final case class BufEvent(key: String, event_id: Long, size: Long)
  // not private: the state encoders' generated code must access these
  final case class BufSlot(event_id: Long, size: Long)
  final case class BufUpdate(key: String, n_buffered: Long,
                             bytes_buffered: Long, rows_dropped_total: Long,
                             oldest_id: Long, newest_id: Long)

  /** Drop-oldest bounded buffer on the Spark 4 transformWithState
    * arbitrary-state API — the reference's O12 per-stream byte budget
    * (stream/manager.go:277-343: append the new batch, then evict the
    * oldest buffered batches until the total fits `--buffer-limit`,
    * counting dropped rows). Reference semantics preserved: the newest
    * entry always survives, so a single over-budget entry is kept
    * alone (manager.go appends unconditionally after eviction).
    *
    * ListState keeps the FIFO buffer (RocksDB-backed: appendValue is
    * an O(1) write, replacing the whole list on evict is one put —
    * per-key state lives on executors, checkpointed, and scales
    * horizontally where the reference's driver-local map cannot);
    * ValueState carries the monotone dropped-row counter. Emits one
    * update per key per micro-batch — the metrics feed O25 expects. */
  class BoundedBufferProcessor(budgetBytes: Long)
      extends StatefulProcessor[String, BufEvent, BufUpdate] {
    @transient private var buf: ListState[BufSlot] = _
    @transient private var dropped: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[BufSlot]("buf",
        org.apache.spark.sql.Encoders.product[BufSlot], TTLConfig.NONE)
      dropped = getHandle.getValueState[Long]("dropped",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[BufEvent],
                                 tv: TimerValues): Iterator[BufUpdate] = {
      val cur = scala.collection.mutable.ArrayBuffer[BufSlot]()
      cur ++= buf.get()
      rows.foreach(e => cur += BufSlot(e.event_id, e.size))
      var total = cur.iterator.map(_.size).sum
      var nDropped = if (dropped.exists()) dropped.get() else 0L
      var from = 0
      while (total > budgetBytes && from < cur.length - 1) {
        total -= cur(from).size
        nDropped += 1
        from += 1
      }
      val kept = cur.drop(from)
      buf.put(kept.toArray)
      dropped.update(nDropped)
      Iterator.single(BufUpdate(key, kept.length.toLong, total, nDropped,
        kept.head.event_id, kept.last.event_id))
    }
  }

  /** Idle-TTL sessionization on the transformWithState API — the same
    * O14 lifecycle as `statefulSessionize` (flatMapGroupsWithState)
    * re-expressed on Spark 4's arbitrary-state surface, where the
    * timeout is an explicit EVENT-TIME TIMER: every input batch
    * re-arms the key's timer at (max event time + ttl), and
    * `handleExpiredTimer` fires once the watermark passes it,
    * emitting the closed session and freeing state. Timers are
    * per-key, RocksDB-backed, checkpointed — O14's driver-local
    * ticker map (stream/manager.go:116-124) distributed across
    * executors. */
  final case class TtlEvent(key: String, ts: java.sql.Timestamp, value: Double)
  // not private: the state encoder's generated code must access it
  final case class TtlAgg(n: Long, total: Double, lastMs: Long)
  final case class TtlSession(key: String, n_events: Long,
                              total_value: Double, closed_at_ms: Long)

  class SessionTtlProcessor(ttlMs: Long)
      extends StatefulProcessor[String, TtlEvent, TtlSession] {
    @transient private var agg: ValueState[TtlAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[TtlAgg]("agg",
        org.apache.spark.sql.Encoders.product[TtlAgg], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TtlEvent],
                                 tv: TimerValues): Iterator[TtlSession] = {
      val prev = if (agg.exists()) agg.get() else TtlAgg(0L, 0.0, 0L)
      var n = prev.n; var total = prev.total; var lastMs = prev.lastMs
      rows.foreach { e =>
        n += 1; total += e.value; lastMs = math.max(lastMs, e.ts.getTime)
      }
      agg.update(TtlAgg(n, total, lastMs))
      // re-arm: one live timer per key (delete-then-register)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(lastMs + ttlMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[TtlSession] = {
      val s = if (agg.exists()) agg.get() else TtlAgg(0L, 0.0, 0L)
      agg.clear()
      Iterator.single(TtlSession(key, s.n, s.total, info.getExpiryTimeInMs()))
    }
  }

  /** Wire a keyed, watermarked event stream through the timer-based
    * TTL processor. */
  def sessionTtlTws(events: Dataset[TtlEvent],
                    ttlMs: Long): Dataset[TtlSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.key)
      .transformWithState(new SessionTtlProcessor(ttlMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Wire a keyed event stream through the bounded-buffer processor
    * (TimeMode NoTime: eviction is size-driven, not clock-driven —
    * exactly the reference's semantics). Requires the RocksDB state
    * store provider; see StreamingSpec. */
  def boundedBufferTws(events: Dataset[BufEvent],
                       budgetBytes: Long): Dataset[BufUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .transformWithState(new BoundedBufferProcessor(budgetBytes),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  // ---- streaming heavy hitters (SpaceSaving) ----------------------

  final case class HhEvent(key: String, item: String)
  // not private: the state encoder's generated code must access it
  final case class HhCounter(item: String, cnt: Long, err: Long)
  final case class HhSummary(key: String, item: String,
                             cnt: Long, err: Long, guaranteed: Boolean)

  /** Streaming top-k heavy hitters per key via SpaceSaving (Metwally
    * et al. 2005, "Efficient computation of frequent and top-k
    * elements in data streams") on transformWithState: at most
    * `capacity` counters of state per key FOREVER — the property that
    * makes per-key frequency tracking viable on an unbounded stream
    * (a plain groupBy count grows with the item cardinality; this is
    * O(capacity), and any item with true count > n/capacity is
    * guaranteed present). On overflow the minimum counter is evicted
    * and its count inherited as the newcomer's error bound; emitted
    * rows carry (cnt, err), so `cnt − err` is a certain lower bound
    * and `guaranteed` marks items whose lower bound clears the next
    * counter — the exact semantics monitoring dashboards need. The
    * reference buffers raw rows (O12) and can answer nothing about
    * frequency without a full scan; this is the streaming-state
    * analog of q_approx_topk. */
  class HeavyHittersProcessor(capacity: Int, k: Int)
      extends StatefulProcessor[String, HhEvent, HhSummary] {
    @transient private var counters: ListState[HhCounter] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counters = getHandle.getListState[HhCounter]("counters",
        org.apache.spark.sql.Encoders.product[HhCounter], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[HhEvent],
                                 tv: TimerValues): Iterator[HhSummary] = {
      val m = scala.collection.mutable.LinkedHashMap.empty[String, HhCounter]
      counters.get().foreach(c => m(c.item) = c)
      rows.foreach { e =>
        m.get(e.item) match {
          case Some(c) => m(e.item) = c.copy(cnt = c.cnt + 1)
          case None if m.size < capacity =>
            m(e.item) = HhCounter(e.item, 1L, 0L)
          case None =>
            // evict the minimum counter (item tie-break for
            // determinism); the newcomer inherits its count as error
            val min = m.values.minBy(c => (c.cnt, c.item))
            m.remove(min.item)
            m(e.item) = HhCounter(e.item, min.cnt + 1, min.cnt)
        }
      }
      val all = m.values.toSeq.sortBy(c => (-c.cnt, c.item))
      counters.put(all.toArray)
      val top = all.take(k)
      // an item is a GUARANTEED top-k member when its certain lower
      // bound (cnt − err) beats the count of the first counter left
      // out of the summary (0 when everything fit)
      val nextCnt = all.drop(k).headOption.map(_.cnt).getOrElse(0L)
      top.iterator.map(c =>
        HhSummary(key, c.item, c.cnt, c.err, (c.cnt - c.err) >= nextCnt))
    }
  }

  def heavyHittersTws(events: Dataset[HhEvent], capacity: Int,
                      k: Int): Dataset[HhSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .transformWithState(new HeavyHittersProcessor(capacity, k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Checkpointed exactly-once parquet sink (fixes the reference's
    * duplicate-persist wart, duckdb/sink.go:89-125 — it re-inserts
    * every buffered batch each 5s tick with no high-water mark; Spark's
    * checkpointed offsets give exactly-once file output by
    * construction). */
  def startParquetSink(df: DataFrame, path: String, checkpoint: String,
                       intervalMs: Long = 5000): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .start()

  /** Rate monitor: hourly event counts per type with the delta and
    * ratio vs the PREVIOUS hour — the derivative a throughput alert
    * fires on (the streaming analog of the reference's
    * messages_received counter deltas, pkg/metrics.go). Composes the
    * tumbling aggregate with a lag window over the bounded
    * (window, type) result — the lag runs on hours x types rows, not
    * raw events, so the second window is calendar-sized at any scale. */
  def qStreamRate(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("window_start")
    hourly
      .withColumn("prev_n", lag("n", 1).over(w))
      .withColumn("delta", when(col("prev_n").isNotNull, col("n") - col("prev_n")))
      .withColumn("rate_ratio",
        when(col("prev_n").isNotNull && (col("prev_n") > 0),
          round(col("n").cast("double") / col("prev_n"), 4)))
      .orderBy("window_start", "event_type")
  }

  /** End-to-end STREAMING read of the buffered store — the north
    * star's "Structured Streaming with Arrow Flight source" shape,
    * run for real: a deterministic fifth of the fixture events is
    * appended to a [[StreamStore]] in event-id-keyed batches, a
    * streaming query SUBSCRIBES via the graft-store MicroBatchStream
    * (monotone append-count offsets, one partition per buffered
    * batch), aggregates per event type into a memory sink, and the
    * completed result is what the DuckDB oracle replays over the same
    * subset. This is an actual StreamingQuery — micro-batch planning,
    * offset log, the V2 streaming scan — not a batch plan that would
    * also run under readStream. Sums are exact integer cents, so
    * batch boundaries and row order cannot flap the hash. */
  def qStreamStoreSource(s: SparkSession, d: String): DataFrame = {
    val sub = events(s, d).filter(col("event_id") % 20 === 0)
      .select(col("event_id"), col("event_type"), col("value"))
    val schema = sub.schema
    val store = new StreamStore(maxBytesPerStream = 1L << 30,
      ttlMillis = Long.MaxValue / 2)
    sub.collect().groupBy(_.getLong(0) / 1000L).toSeq.sortBy(_._1)
      .foreach { case (_, rs) => store.append("events", schema, rs.toSeq) }
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val storeName = s"verify_store_$tag"
    val sinkName = s"store_src_$tag"
    graft.sources.GraftStoreRegistry.register(storeName, store)
    try {
      val q = s.readStream.format("graft-store")
        .option("store", storeName).option("topic", "events").load()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)")).as("sum_cents"))
        .writeStream.format("memory").queryName(sinkName)
        .outputMode(OutputMode.Complete()).start()
      try { q.processAllAvailable() } finally q.stop()
      s.table(sinkName).orderBy("event_type")
    } finally graft.sources.GraftStoreRegistry.unregister(storeName)
  }

  /** The connector's METADATA COLUMNS, differentially gated: the same
    * deterministic store staging as [[qStreamStoreSource]] (one batch
    * per 1000-id block, appended in block order), then a batch read
    * that groups by `_batch_offset` — the Kafka-offset analog the
    * reference projects per message (O4). Because block b of the
    * sorted append IS ids [1000b, 1000b+999], the oracle recomputes
    * every row's batch offset as `event_id // 1000` without touching
    * the store: a provenance bug anywhere in the partition planning
    * or the metadata getters breaks the hash. */
  def qStoreMetaCols(s: SparkSession, d: String): DataFrame = {
    val sub = events(s, d).filter(col("event_id") % 20 === 0)
      .select(col("event_id"), col("event_type"), col("value"))
    val schema = sub.schema
    val store = new StreamStore(maxBytesPerStream = 1L << 30,
      ttlMillis = Long.MaxValue / 2)
    sub.collect().groupBy(_.getLong(0) / 1000L).toSeq.sortBy(_._1)
      .foreach { case (_, rs) => store.append("events", schema, rs.toSeq) }
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val storeName = s"verify_meta_$tag"
    graft.sources.GraftStoreRegistry.register(storeName, store)
    try {
      s.read.format("graft-store")
        .option("store", storeName).option("topic", "events").load()
        .select(col("_batch_offset").as("batch_offset"), col("event_id"))
        .groupBy("batch_offset")
        .agg(count(lit(1)).as("n_rows"),
          min("event_id").as("min_id"), max("event_id").as("max_id"))
        .orderBy("batch_offset")
        // the store is JVM-local: materialize before unregistering
        .localCheckpoint(true)
    } finally graft.sources.GraftStoreRegistry.unregister(storeName)
  }
}
