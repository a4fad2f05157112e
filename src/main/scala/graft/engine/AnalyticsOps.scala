package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over the `events` stream: funnels,
  * cohort retention, first-seen accumulation, CDC last-wins upsert,
  * and map-typed aggregation. These are the queries a product
  * analytics / training-data pipeline runs on the reference's
  * buffered streams once a real engine sits behind them (the
  * reference itself can only full-scan, flight/server.go:171-208).
  *
  * Scale shape shared by all of them: shuffle on user_id once,
  * aggregate to per-user rows (bounded by |users|, not |events|),
  * then tiny second-stage aggregations. No driver-side state.
  */
object AnalyticsOps {
  import Tables._

  /** Ordered 3-stage funnel (view → click → purchase, each within 1
    * day of the prior stage): per stage, how many users progressed in
    * order. Implemented as successive min-timestamp joins — each
    * stage's frontier is one row per user, so the joins stay
    * user-cardinality-sized regardless of event volume. */
  def qFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select("user_id", "event_type", "ts")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") >= col("t1") &&
        col("ts") <= col("t1") + expr("interval 1 day"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") >= col("t2") &&
        col("ts") <= col("t2") + expr("interval 1 day"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    val stage = (n: Int, name: String, df: DataFrame) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(n.toLong).as("stage"), lit(name).as("name"), col("n_users"))
    stage(1, "view", v)
      .unionByName(stage(2, "view>click", c))
      .unionByName(stage(3, "view>click>purchase", p))
      .orderBy("stage")
  }

  /** Weekly cohort retention: users are cohorted by the ISO week of
    * their first event; each (cohort, week-offset) cell counts users
    * still active that week. The left side collapses to one row per
    * (user, week) before the cohort join, so the matrix build never
    * re-shuffles raw events. */
  def qRetentionCohort(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val c = e.groupBy("user_id").agg(min("wk").as("cohort"))
    e.join(c, "user_id")
      .groupBy(
        unix_timestamp(col("cohort")).as("cohort_start"),
        (datediff(to_date(col("wk")), to_date(col("cohort"))) / 7)
          .cast("long").as("week_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_start", "week_offset")
  }

  /** Daily new-user counts + running cumulative distinct users: the
    * streaming-dashboard staple. Exact cumulative distinct is
    * re-expressed as first-seen-day per user (one shuffle on user_id)
    * + a running sum over days — the decomposition that stays exact
    * at any scale, where a naive COUNT(DISTINCT) OVER (ORDER BY day)
    * would re-scan every prefix. */
  def qCumulativeDistinct(s: SparkSession, d: String): DataFrame = {
    val firstDay = events(s, d)
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("first_day"))
    val daily = firstDay.groupBy("first_day").agg(count(lit(1)).as("n_new"))
    // days are few (bounded by calendar span) — a single-partition
    // running sum over the daily rollup is fine at any event volume
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("first_day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    daily
      .select(
        unix_timestamp(col("first_day").cast("timestamp")).as("day_start"),
        col("n_new"),
        sum("n_new").over(w).cast("long").as("cum_users"))
      .orderBy("day_start")
  }

  /** CDC last-wins upsert with delete markers (the materialize step
    * of a change stream): per key keep only the latest change by
    * (event time, sequence) — and if that latest change is a delete
    * (event_type = 'error' plays the tombstone), the key vanishes.
    * One window shuffle on the key; at scale this is the MERGE INTO
    * pattern a lakehouse table maintains incrementally. */
  def qCdcUpsert(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        round(col("value"), 2).as("last_value"))
      .orderBy("user_id")
  }

  /** Map-typed aggregation: per user, a sorted event_type→count map
    * built with map_from_entries, then consumed with map_keys /
    * element_at / size. The map is per-user-bounded (≤5 keys), so
    * carrying MapType through the plan is safe at any row count —
    * the pattern for feature maps in a training pipeline. */
  def qMapFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("event_type"), col("n")))))
        .as("m"))
      .select(
        col("user_id"),
        array_join(map_keys(col("m")), ",").as("types"),
        size(col("m")).cast("long").as("n_types"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
        coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"))
      .orderBy("user_id")

  /** Gaps-and-islands: maximal runs of consecutive activity days per
    * user via the epoch-day-minus-row_number grouping trick. One
    * distinct + one window sort per user partition; day keys are
    * epoch-day longs so both engines agree bit-for-bit. At corpus
    * scale the distinct and the window share the user_id shuffle. */
  def qGapsIslands(s: SparkSession, d: String): DataFrame = {
    val days = events(s, d)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("epoch_day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("epoch_day")
    days
      .withColumn("g", col("epoch_day") - row_number().over(w))
      .groupBy("user_id", "g")
      .agg(min("epoch_day").as("island_start"),
        max("epoch_day").as("island_end"),
        count(lit(1)).as("n_days"))
      .filter(col("n_days") >= 2)
      .select("user_id", "island_start", "island_end", "n_days")
      .orderBy("user_id", "island_start")
  }

  /** SCD type-2 history build: collapse each user's event_type stream
    * to change rows, then stamp validity intervals with lead() —
    * valid_to of the open interval is sentinel -1 with is_current=1.
    * Two window passes sharing one user_id shuffle; the warehouse
    * dimension-history shape derived purely from an append log. */
  def qScd2History(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_from_ms", unix_millis(col("ts")))
      .withColumn("valid_to_ms", lead(unix_millis(col("ts")), 1).over(w))
      .select(col("user_id"), col("event_type"), col("valid_from_ms"),
        coalesce(col("valid_to_ms"), lit(-1L)).as("valid_to_ms"),
        col("valid_to_ms").isNull.cast("int").as("is_current"),
        col("event_id"))
      .orderBy("user_id", "valid_from_ms", "event_id")
      .drop("event_id")
      .limit(2000)
  }

  /** Linear gap interpolation: deterministic nulls (event_id % 5) are
    * filled by interpolating between the nearest non-null neighbors on
    * the time axis (IGNORE NULLS frames both directions; leading /
    * trailing gaps degrade to back-/forward-fill). Two frame passes
    * over one user_id shuffle — the time-series repair primitive
    * q_resample_ffill's LOCF can't express. */
  def qInterpLinear(s: SparkSession, d: String): DataFrame = {
    val wp = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wf = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val msOfV = when(col("v").isNotNull, col("ms"))
    events(s, d)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"),
        when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value")).as("v"))
      .withColumn("pv", last("v", ignoreNulls = true).over(wp))
      .withColumn("pms", last(msOfV, ignoreNulls = true).over(wp))
      .withColumn("nv", first("v", ignoreNulls = true).over(wf))
      .withColumn("nms", first(msOfV, ignoreNulls = true).over(wf))
      .select(col("user_id"), col("event_id"),
        round(
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (col("ms") - col("pms")) / (col("nms") - col("pms"))), 3).as("vi"),
        col("v").isNull.cast("int").as("was_gap"))
      .orderBy("user_id", "event_id")
  }

  /** Batch sessionization with a 30-minute idle gap — the exact
    * event-time semantics `statefulSessionize` (StreamingOps) applies
    * incrementally, derived here with lag + a running sum of
    * session-start flags so the streaming operator has a batch
    * differential oracle (reference O14 idle-TTL analog,
    * stream/manager.go:150-184). Both windows and the final aggregate
    * share one user_id shuffle. */
  def qSessionizeBatch(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val e = events(s, d)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev", lag(col("ms"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("ms") - col("prev") > 1800000L, 1L)
          .otherwise(0L))
    e.withColumn("sess_n",
        sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_n")
      .agg(count(lit(1)).as("n_events"),
        round((max("ms") - min("ms")) / 1000.0, 3).as("dur_sec"))
      .filter(col("n_events") >= 3)
      .orderBy("user_id", "sess_n")
  }
}
