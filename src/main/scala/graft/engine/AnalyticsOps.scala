package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // r15 note: checkpointing stages v/c (each read by the next stage
    // + its own count) was measured SLOWER (0.44 -> 0.59 s) — two
    // eager jobs against three cheap filtered events re-scans
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

  /** Batch sessionization via Spark's BUILT-IN `session_window`
    * (SessionWindowing + MergingSessionsExec — the engine's native
    * gap-session operator, one shuffle on the user key, no windows):
    * the API a Spark user reaches for first, cross-validated against
    * the same gap semantics spelled out in SQL. Boundary pinned
    * exactly: an event at `prev + gap` starts a NEW session
    * (session_window merges only while `t < prev_end`), and the
    * oracle replays that with integer-µs arithmetic. Complement of
    * [[qSessionizeBatch]], which derives sessions from window
    * functions instead. */
  def qSessionWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") >= 3L)
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")

  /** Shannon entropy (bits) of each user's event-type mix — the
    * behavioral-diversity score a curation pipeline uses to separate
    * bots (entropy ~0) from organic users. Two-stage: count per
    * (user, type) first, so the entropy pass runs over the |users|×
    * |types| aggregate, never the raw events. */
  def qEntropy(s: SparkSession, d: String): DataFrame = {
    val c = events(s, d)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
    val wu = Window.partitionBy("user_id")
    c.withColumn("tot", sum("n").over(wu))
      .groupBy("user_id")
      .agg(
        max("tot").cast("long").as("n_events"),
        count(lit(1)).cast("long").as("n_types"),
        round(-sum((col("n") / col("tot")) * log(col("n") / col("tot"))) /
          log(lit(2.0)), 4).as("entropy_bits"))
      .orderBy("user_id")
  }

  /** Pearson chi-squared contributions for nation × order-priority
    * independence. The contingency table (|nations| × |priorities|)
    * is built with one aggregation over the fact join; marginals and
    * the grand total are derived FROM that table (tiny), and the
    * zero-observed cells are materialized by crossing the marginals
    * so expected counts are complete — all broadcast-sized. */
  def qChi2(s: SparkSession, d: String): DataFrame = {
    val obs = orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "o_orderpriority")
      .agg(count(lit(1)).cast("double").as("o"))
      // contingency-table-sized (|nations|·|prios|) and referenced by
      // all three marginals + the cell join — materialize once
      // instead of re-running the fact join per reference (r15)
      .localCheckpoint(true)
    val rt = obs.groupBy("n_name").agg(sum("o").as("r"))
    val ct = obs.groupBy("o_orderpriority").agg(sum("o").as("c"))
    val g = obs.agg(sum("o").as("t"))
    rt.crossJoin(broadcast(ct)).crossJoin(broadcast(g))
      .join(obs, Seq("n_name", "o_orderpriority"), "left")
      .withColumn("obs0", coalesce(col("o"), lit(0.0)))
      .withColumn("e", col("r") * col("c") / col("t"))
      .groupBy("n_name")
      .agg(
        sum("obs0").cast("long").as("n_orders"),
        round(sum(pow(col("obs0") - col("e"), 2) / col("e")), 4).as("chi2_contrib"))
      .orderBy("n_name")
  }

  /** First-order Markov transition matrix over each user's event
    * sequence: P(next type | type). One user_id shuffle orders the
    * sequences; the transition counts then collapse to a |types|²
    * table, and the row-normalizing window runs on that table, not
    * the events. */
  def qMarkovTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events(s, d)
      .withColumn("dst", lead("event_type", 1).over(w))
      .filter(col("dst").isNotNull)
    pairs.groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n") / sum("n").over(Window.partitionBy("src")), 4))
      .orderBy("src", "dst")
  }

  /** Tukey-fence outlier detection per event type: discrete Q1/Q3
    * via the same ceil(q·n) ranking as qQuantileDisc, fences at
    * 1.5·IQR. The per-group quantile table is 5 rows — broadcast back
    * onto the stream, so the flagging pass is a map-side filter. */
  def qOutlierIqr(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    val wAll = Window.partitionBy("event_type")
    val pick = (f: Double) =>
      max(when(col("rn") === ceil(lit(f) * col("n")).cast("long"), col("value")))
    val q = events(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .groupBy("event_type")
      .agg(pick(0.25).as("q1"), pick(0.75).as("q3"))
    events(s, d)
      .join(broadcast(q), "event_type")
      .filter(col("value") > col("q3") + (col("q3") - col("q1")) * 1.5 ||
        col("value") < col("q1") - (col("q3") - col("q1")) * 1.5)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_outliers"),
        round(min("value"), 4).as("min_outlier"),
        round(max("value"), 4).as("max_outlier"),
        round(max(col("q3") + (col("q3") - col("q1")) * 1.5), 4).as("hi_fence"))
      .orderBy("event_type")
  }

  /** Time-weighted average of `value` per user over irregular event
    * times (each reading holds until the next one) — the correct mean
    * for unevenly-sampled gauges. Segment durations come from one
    * lead() over the per-user order; everything after is a plain
    * aggregate on the same shuffle. Microsecond integer arithmetic —
    * no fractional-epoch doubles. */
  def qTimeWeightedAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("nxt", lead("ts", 1).over(w))
      .filter(col("nxt").isNotNull)
      .withColumn("dt", unix_micros(col("nxt")) - unix_micros(col("ts")))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_segments"),
        sum("dt").cast("long").as("total_us"),
        round(sum(col("value") * col("dt")) / sum("dt"), 4).as("twa"))
      .filter(col("total_us") > 0)
      .orderBy("user_id")
  }

  /** MERGE INTO semantics as one full outer join + per-clause CASEs:
    * WHEN MATCHED AND src is a tombstone → DELETE, WHEN MATCHED →
    * UPDATE, WHEN NOT MATCHED → INSERT, unmatched target rows kept.
    * Target/source are disjoint last-state snapshots (user_id mod
    * splits) so all four clauses fire. This is the lakehouse
    * MERGE shape: both sides collapse to one row per key first, so
    * the join is key-cardinality-sized; the action column is the
    * audit trail a writer would use to split the output into
    * rewrite/append sets. */
  def qMergeUpsert(s: SparkSession, d: String): DataFrame = {
    def latest(df: DataFrame, cols: String*): DataFrame = {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", cols: _*)
    }
    val e = events(s, d)
    val tgt = latest(e.filter(col("user_id") % 4 =!= 0), "value")
      .withColumnRenamed("value", "t_value")
      .withColumnRenamed("user_id", "t_user")
    val src = latest(e.filter(col("user_id") % 3 === 0), "value", "event_type")
      .withColumnRenamed("value", "s_value")
      .withColumnRenamed("user_id", "s_user")
    tgt.join(src, col("t_user") === col("s_user"), "full_outer")
      .filter(!(col("t_user").isNotNull && col("s_user").isNotNull &&
        col("event_type") === "error"))
      .select(
        coalesce(col("t_user"), col("s_user")).as("user_id"),
        when(col("s_user").isNull, "keep")
          .when(col("t_user").isNull, "insert")
          .otherwise("update").as("action"),
        round(when(col("s_user").isNull, col("t_value"))
          .otherwise(col("s_value")), 2).as("value"))
      .orderBy("user_id")
  }

  /** Time-to-event: per user, microseconds from first signup to first
    * purchase (users with both, purchase not before signup) — the
    * survival-analysis / conversion-latency primitive. ONE
    * conditional-min aggregation pass (no join, no window); µs
    * integer arithmetic end-to-end so both engines subtract exact
    * longs (same discipline as qTimeWeightedAvg). */
  def qTimeToEvent(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("t_s"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("t_p"))
      .filter(col("t_s").isNotNull && col("t_p").isNotNull && col("t_p") >= col("t_s"))
      .select(col("user_id"), (col("t_p") - col("t_s")).as("micros_to_convert"))
      .orderBy("user_id")

  /** Interval-overlap analysis: each event opens a 5-minute half-open
    * window [ts, ts+5min); per user, the PEAK number of concurrently
    * open windows — the classic sweep-line reduced to a window sum:
    * +1 at each start, −1 at each end, running sum over (time, delta,
    * event_id) order (delta ascending ⇒ ends process before starts at
    * the same instant = half-open semantics), then a max. All integer
    * arithmetic over exact µs — nothing can flap. O(n log n) per
    * user vs the O(n²) pair self-join a naive overlap query runs. */
  def qIntervalOverlap(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("s_us"), col("event_id"))
    val pts = e.select(col("user_id"), col("s_us").as("t"),
        lit(1L).as("delta"), col("event_id"))
      .unionByName(e.select(col("user_id"),
        (col("s_us") + lit(300000000L)).as("t"),
        lit(-1L).as("delta"), col("event_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("t"), col("delta"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    pts.withColumn("conc", sum("delta").over(w))
      .groupBy("user_id")
      .agg((count(lit(1)) / 2).cast("long").as("n_events"),
        max("conc").as("peak_concurrent"))
      .orderBy("user_id")
  }

  /** Last-touch attribution: each purchase is credited to the user's
    * most recent preceding click or view (within the session history)
    * — the marketing-analytics primitive. One window pass: the
    * conditional last_value over a running frame finds the touch
    * without a self-join; exact µs timestamps; purchases with no
    * prior touch attribute to 'none'. Output: touches per channel
    * with credited purchase counts. */
  def qAttribution(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("last_touch",
        last(when(col("event_type").isin("click", "view"), col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("last_touch"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum("value"), 2).as("attributed_value"))
      .orderBy("channel")
  }
  /** Kaplan-Meier survival estimate (Kaplan & Meier 1958) of
    * time-to-conversion: per user, duration in whole days from first
    * activity to first purchase (observed) or to last activity
    * (right-censored). The corpus-sized work is ONE user_id
    * aggregation; the KM table itself — at-risk counts, per-day
    * events/censorings, and the product-limit survival curve — runs
    * on the per-duration aggregate (≤ observation-window days, i.e.
    * calendar-bounded), so the unpartitioned windows below never see
    * corpus-sized input. Survival = exp(Σ ln(1 − dᵢ/nᵢ)), with an
    * explicit zero-factor guard because Spark's ln(0) is NULL while
    * C-family engines give -inf — the guard makes both engines emit
    * an exact 0. */
  def qSurvivalKm(s: SparkSession, d: String): DataFrame = {
    val per = Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        min(unix_micros(col("ts"))).as("t0"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
          .as("tp"),
        max(unix_micros(col("ts"))).as("tlast"))
      .select(
        when(col("tp").isNotNull, 1).otherwise(0).as("observed"),
        expr("(COALESCE(tp, tlast) - t0) DIV 86400000000").as("t"))
    val byT = per.groupBy("t").agg(
      sum(col("observed")).as("n_event"),
      sum(lit(1) - col("observed")).as("n_censor"))
    val all = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val prev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val upto = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk",
        sum(col("n_event") + col("n_censor")).over(all) -
          coalesce(sum(col("n_event") + col("n_censor")).over(prev), lit(0L)))
      .withColumn("factor",
        lit(1.0) - col("n_event").cast("double") / col("n_risk").cast("double"))
      .select(
        col("t").cast("long").as("duration_days"),
        col("n_risk").cast("long").as("n_risk"),
        col("n_event").cast("long").as("n_event"),
        col("n_censor").cast("long").as("n_censor"),
        when(min(col("factor")).over(upto) === 0.0, lit(0.0))
          .otherwise(round(exp(sum(log(
            when(col("factor") === 0.0, 1.0).otherwise(col("factor")))).over(upto)), 6))
          .as("surv"))
      .orderBy("duration_days")
  }

  /** Sequence-pattern detection (the regex form of MATCH_RECOGNIZE):
    * each user's event history becomes an initial-letter string in
    * exact (ts, event_id) order, and conversions are non-overlapping
    * matches of view→clicks→purchase (`vc+p`) — arbitrary funnel
    * shapes are one regex away, which is the operator's point versus
    * the fixed-stage [[qFunnel]]. One shuffle (groupBy user);
    * `array_sort` on (µs, id, initial) structs makes the sequence
    * deterministic under any partitioning. Per-user history is
    * bounded in practice (sessions); a hub user would cap the
    * sequence the same way pair mining caps baskets. */
  def qEventPattern(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("t"), col("event_id").as("e"),
          substring(col("event_type"), 1, 1).as("i")).as("x"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        array_join(expr("transform(array_sort(collect_list(x)), v -> v.i)"),
          "").as("seq"))
      .select(col("user_id"), col("n_events"),
        size(expr("regexp_extract_all(seq, 'vc+p', 0)")).cast("long")
          .as("n_conversions"),
        (size(expr("regexp_extract_all(seq, 'vc+p', 0)")) > 0).cast("int")
          .as("converted"))
      .orderBy("user_id")

  /** Windowed leaderboard: top-3 users by event count per 6-hour
    * tumbling window — the "trending now" query. The rank runs on
    * the (window, user) AGGREGATE (one shuffle, map-side combined),
    * not raw events; per-window cardinality is user-bounded, and at
    * extreme fan-in the rank's per-window sort is replaced by a
    * per-partition heap (TakeOrdered per window key) — same
    * semantics, noted for the 100 TB path. Epoch-aligned floor
    * arithmetic keeps the window key engine-portable. */
  def qWindowTopk(s: SparkSession, d: String): DataFrame = {
    val winStart = (unix_timestamp(col("ts")) / 21600).cast("long") * 21600
    val counts = events(s, d)
      .select(winStart.as("window_start"), col("user_id"))
      .groupBy("window_start", "user_id")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("window_start")
      .orderBy(col("n").desc, col("user_id"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("window_start", "rank", "user_id", "n")
      .orderBy("window_start", "rank")
  }

  /** Feature-store build: the per-user churn-model feature vector
    * (tenure, recency, frequency, monetary, activity trend) computed
    * in ONE user-keyed aggregate over the event log — conditional
    * aggregation instead of five self-joins, the shape that holds at
    * any event volume. Every feature is integer days/counts/cents
    * (monetary divides cents by 100 exactly); the global high-water
    * day rides along as a broadcast scalar. */
  def qChurnFeatures(s: SparkSession, d: String): DataFrame = {
    val day = datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
      .cast("long")
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    val perUser = events(s, d)
      .select(col("user_id"), day.as("day"), col("event_type"),
        col("ts"), round(col("value") * 100).cast("long").as("c"))
      .groupBy("user_id")
      .agg(
        (max("day") - min("day")).as("tenure_days"),
        count(lit(1)).as("n_events"),
        sum((col("event_type") === "purchase").cast("long")).as("n_purchases"),
        (sum(when(col("event_type") === "purchase", col("c"))
          .otherwise(0L)) / 100.0).as("monetary"),
        max("day").as("last_day"),
        (sum((col("ts") >= cut).cast("long")) -
          sum((col("ts") < cut).cast("long"))).as("trend"))
    val hwm = perUser.agg(max("last_day").as("hwm"))
    perUser.crossJoin(broadcast(hwm))
      .select(col("user_id"), col("tenure_days"), col("n_events"),
        col("n_purchases"), col("monetary"),
        (col("hwm") - col("last_day")).as("recency_days"), col("trend"))
      .orderBy("user_id")
      .limit(100)
  }

  /** Rate-burst detection: hours whose event count exceeds the
    * type's Poisson expectation by 3σ (n > μ + 3√μ) — the alerting
    * rule a traffic monitor runs per tumbling hour. Hourly counts
    * are one map-side-combined aggregate; the per-type summary
    * (burst count, peak hour) runs on the calendar-×-type-bounded
    * hourly table, so every float step sees exact integer inputs. */
  def qBurstDetect(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val hourly = events(s, d)
      .groupBy(col("event_type"),
        ((unix_timestamp(col("ts")) / 3600).cast("long") * 3600).as("hour"))
      .agg(count(lit(1)).as("n"))
    val wt = Window.partitionBy("event_type")
    val wPeak = Window.partitionBy("event_type")
      .orderBy(col("n").desc, col("hour"))
    hourly
      .withColumn("mu", sum("n").over(wt).cast("double") /
        count(lit(1)).over(wt))
      .withColumn("burst", (col("n") > col("mu") + sqrt(col("mu")) * 3.0)
        .cast("long"))
      .withColumn("rn", row_number().over(wPeak))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        r4(max("mu")).as("mu"),
        sum("burst").as("n_bursts"),
        max(when(col("rn") === 1, col("hour"))).as("peak_hour"),
        max(when(col("rn") === 1, col("n"))).as("peak_n"))
      .orderBy("event_type")
  }

  /** Population stability index between the first and second half of
    * the event log, per event type — THE model-monitoring drift
    * metric (PSI > 0.2 = retrain). Values land in fixed $10-wide
    * bins (map-side arithmetic, no quantile pass), each half's
    * counts stay integer, and the 0.5/half-count smoothing keeps
    * ln(p/q) finite on empty bins; the float PSI sum runs over ≤10
    * bins per type. */
  def qPsiDrift(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    val binned = events(s, d)
      .select(col("event_type"),
        least(expr("CAST(ROUND(value*100) AS BIGINT) DIV 1000"), lit(9L))
          .as("bin"),
        (col("ts") >= cut).cast("long").as("late"))
      .groupBy("event_type", "bin")
      .agg(sum(lit(1L) - col("late")).as("c0"), sum("late").as("c1"))
    val wt = Window.partitionBy("event_type")
    binned
      .withColumn("n0", sum("c0").over(wt))
      .withColumn("n1", sum("c1").over(wt))
      .withColumn("p", (col("c0") + 0.5) / (col("n0") + 5.0))
      .withColumn("q", (col("c1") + 0.5) / (col("n1") + 5.0))
      .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
      .groupBy("event_type")
      .agg(max("n0").as("n_before"), max("n1").as("n_after"),
        r4(sum("term")).as("psi"))
      .orderBy("event_type")
  }

  /** Day-of-week seasonality profile: per (event type, weekday), the
    * mean value and its seasonal index vs the type's overall mean —
    * the decomposition input for traffic forecasting / anomaly
    * baselines. All sums are exact integer cents, so the only float
    * step is one final division; the per-type totals ride a window
    * over the 35-row (type × dow) aggregate, never the fact table.
    * Weekday is dayofweek-1 (0 = Sunday), matching strftime('%w'). */
  def qSeasonalDow(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val cents = round(col("value") * 100).cast("long")
    val byDow = events(s, d)
      .select(col("event_type"), (dayofweek(col("ts")) - 1).cast("int").as("dow"),
        cents.as("c"))
      .groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n"), sum("c").as("sum_c"))
    val wt = Window.partitionBy("event_type")
    byDow
      .withColumn("tot_n", sum("n").over(wt))
      .withColumn("tot_c", sum("sum_c").over(wt))
      .select(col("event_type"), col("dow"), col("n"),
        r4(col("sum_c") / (col("n") * 100.0)).as("dow_mean"),
        // sum_c·tot_n and n·tot_c are each cross-products of two
        // corpus-scale aggregated longs (~10¹⁶ × 10¹² at 10¹² rows) —
        // they wrap 2⁶³ silently in non-ANSI Spark, so both products
        // go double-led (cast BEFORE the multiply, mirrored in the
        // oracle); exact in double at any SF the gate runs.
        r4((col("sum_c").cast("double") * col("tot_n")) /
          (col("n").cast("double") * col("tot_c"))).as("seasonal_idx"))
      .orderBy("event_type", "dow")
  }

  /** CUSUM drift detection on the daily purchase-value mean: the
    * running sum of (daily mean − overall mean) spikes where the
    * level shifts — the standard changepoint monitor for a metrics
    * pipeline. The cumulative state is kept INTEGER (running cent
    * and count sums — exact under any summation tree), so each
    * day's CUSUM is one float expression over exact inputs:
    * cum_cents − cum_n·μ. No float ever accumulates, which is what
    * makes the peak flag and the 4-decimal rounding engine-exact. */
  def qCusumDrift(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val daily = events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_c"))
    val wAll = Window.partitionBy()
    val wUpto = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("mu_c",
        sum("sum_c").over(wAll).cast("double") / sum("n").over(wAll))
      .withColumn("cum_c", sum("sum_c").over(wUpto))
      .withColumn("cum_n", sum("n").over(wUpto))
      .withColumn("cusum",
        (col("cum_c") - col("cum_n") * col("mu_c")) / 100.0)
      .withColumn("peak",
        (abs(col("cusum")) === max(abs(col("cusum"))).over(wAll)).cast("int"))
      .select(col("day"), col("n"),
        r4(col("sum_c") / (col("n") * 100.0)).as("daily_mean"),
        r4(col("cusum")).as("cusum"), col("peak").as("is_peak"))
      .orderBy("day")
  }

  /** 7-day rolling Pearson correlation between daily click and
    * purchase counts — co-movement monitoring (a funnel break shows
    * as decorrelation). The rolling sums are INTEGER (counts and
    * their products), so the correlation is one exact-input float
    * expression per day; only full 7-day windows emit. Calendar-
    * bounded single-partition window by construction. */
  def qRollingCorr(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val daily = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum((col("event_type") === "click").cast("long")).as("x"),
        sum((col("event_type") === "purchase").cast("long")).as("y"))
    val w7 = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    val wRn = Window.orderBy("day")
    val n = lit(7L)
    daily
      .withColumn("rn", row_number().over(wRn))
      .withColumn("sx", sum("x").over(w7))
      .withColumn("sy", sum("y").over(w7))
      .withColumn("sxy", sum(col("x") * col("y")).over(w7))
      .withColumn("sx2", sum(col("x") * col("x")).over(w7))
      .withColumn("sy2", sum(col("y") * col("y")).over(w7))
      .filter(col("rn") >= 7)
      // products of 7-day count sums are n⁴-scale: at ~1e9 events/day
      // n·sxy passes 2⁶³ — compute each product in double (exact
      // conversion below 2⁵³, identical IEEE rounding both engines)
      .withColumn("num", n.cast("double") * col("sxy") -
        col("sx").cast("double") * col("sy"))
      .withColumn("den", sqrt(
        (n.cast("double") * col("sx2") - col("sx").cast("double") * col("sx")) *
        (n.cast("double") * col("sy2") - col("sy").cast("double") * col("sy"))))
      .select(col("day"), col("x").as("n_click"), col("y").as("n_purchase"),
        when(col("den") === 0.0, lit(null).cast("double"))
          .otherwise(r4(col("num") / col("den"))).as("roll_corr"))
      .orderBy("day")
  }

  /** Top user journeys: the first three events of every user's
    * timeline, concatenated into a path string ("signup>view>click"),
    * counted across users — the onboarding-funnel discovery query
    * ([[qMarkovTransitions]] gives edge weights; this gives whole
    * prefixes). The per-user window orders each user's OWN events
    * (bounded partitions, the sessionize shape); the prefix is
    * assembled by sorting the ≤3 collected (rank, type) structs
    * inside the row — no second window, no cross-user data motion
    * beyond the path groupBy. Top-20 by user count, path tie-break. */
  def qUserPath(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy("user_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("event_type")))),
        x => x.getField("event_type")), ">").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(20)
  }

  /** Wald-Wolfowitz runs test per user: is the up/down pattern of a
    * user's transaction values random, or does it trend/alternate?
    * (The sequence-level randomness audit that complements
    * [[StatsOps.qAutocorr]]'s linear view.) Signs come from exact
    * integer cents deltas (zero deltas dropped — ties carry no
    * direction); runs are counted as sign changes + 1 via a second
    * lag over the SAME per-user window (one sort, two frames). The
    * z statistic against the exact null mean/variance is pure
    * arithmetic on per-user counts; degenerate users (all-up,
    * all-down, or σ = 0) are excluded by construction — the zscore
    * lesson. */
  def qRunsTest(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val signs = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("c"))
      .withColumn("delta", col("c") - lag("c", 1).over(w))
      .filter(col("delta").isNotNull && col("delta") =!= 0L)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("delta") > 0L).cast("long").as("up"))
    val w2 = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val perUser = signs
      .withColumn("chg",
        when(lag("up", 1).over(w2).isNull, 1L)
          .when(lag("up", 1).over(w2) =!= col("up"), 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum("up").as("n_up"),
        (count(lit(1)) - sum("up")).as("n_down"),
        sum("chg").as("runs"))
      .filter(col("n_up") > 0L && col("n_down") > 0L)
    perUser
      .withColumn("m", col("n_up") + col("n_down"))
      .withColumn("mu", (lit(2.0) * col("n_up") * col("n_down")) / col("m") + 1.0)
      .withColumn("v",
        (lit(2.0) * col("n_up") * col("n_down") *
          (lit(2L) * col("n_up") * col("n_down") - col("m")).cast("double")) /
          ((col("m") * col("m")).cast("double") * (col("m") - 1L)))
      .filter(col("v") > 0.0)
      .select(col("user_id"), col("n_up"), col("n_down"), col("runs"),
        r4((col("runs") - col("mu")) / sqrt(col("v"))).as("z_runs"))
      .orderBy("user_id")
  }

  /** Weekly-cohort lifetime value: users grouped by first-seen week,
    * cumulative purchase revenue tracked per week since signup — the
    * LTV curve behind every retention/payback decision, and the
    * revenue companion of [[qRetentionCohort]]'s activity matrix.
    * Two user-keyed aggregates (first-seen, weekly purchase cents)
    * join on the user key; everything after lives on the (cohort ×
    * week) grid — calendar-bounded, so the running sum's window is
    * safe at any corpus size. Revenue in exact integer cents until
    * the final /100. Weeks with no purchases for a cohort simply
    * don't appear (the curve is over observed weeks). */
  def qCohortLtv(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val first = ev.groupBy("user_id").agg(min("ts").as("first_ts"))
      .select(col("user_id"), date_trunc("week", col("first_ts")).as("cohort"))
      .localCheckpoint(true) // cohort join + cohort sizes — one pass (r15)
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("c"))
    val g = purch.join(first, "user_id")
      .groupBy("cohort", "wk").agg(sum("c").as("wk_cents"))
      .withColumn("week_index",
        (datediff(to_date(col("wk")), to_date(col("cohort"))) / 7).cast("long"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_users"))
    val wcum = Window.partitionBy("cohort").orderBy("week_index")
      .rowsBetween(Window.unboundedPreceding, 0)
    g.join(broadcast(sizes), "cohort")
      .withColumn("cum_cents", sum("wk_cents").over(wcum))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_index"), col("n_users"),
        (col("wk_cents") / 100.0).as("wk_revenue"),
        (col("cum_cents") / 100.0).as("cum_revenue"))
      .orderBy("cohort_week", "week_index")
  }

  /** Mutual information between return flag and line status — the
    * feature-selection screen that ranks categorical column pairs by
    * shared information (chi-squared's information-theoretic twin,
    * [[qChi2]]). One corpus aggregate builds the joint contingency
    * table; marginals and the total derive FROM it (all
    * domain-bounded, all broadcast). Per-cell PMI = ln(n_ij·N /
    * (n_i·n_j)) is a log of a ratio of exact longs (products stay
    * under 2^53, so the double conversion is exact), and the MI
    * contribution n_ij/N · PMI follows — no float accumulation until
    * the final (≤ |cells|-sized) rounding. */
  def qMutualInfo(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val joint = lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("nij"))
    val rm = joint.groupBy("l_returnflag").agg(sum("nij").as("ni"))
    val cm = joint.groupBy("l_linestatus").agg(sum("nij").as("nj"))
    val tot = joint.agg(sum("nij").as("n"))
    joint
      .join(broadcast(rm), "l_returnflag")
      .join(broadcast(cm), "l_linestatus")
      .crossJoin(broadcast(tot))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("nij").cast("long").as("n_lines"),
        // nij·n and ni·nj are n²-scale count products — wrap past
        // ~3·10⁹ rows — so they multiply double·long (q_spearman rule)
        r4(log(col("nij").cast("double") * col("n") /
          (col("ni").cast("double") * col("nj")))).as("pmi"),
        r4((col("nij") / col("n").cast("double")) *
          log(col("nij").cast("double") * col("n") /
            (col("ni").cast("double") * col("nj")))).as("mi_contrib"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Weight-of-evidence / information-value binning of order value
    * against fulfillment — the credit-scoring-style feature audit
    * that grades a numeric column's separating power bin by bin
    * (the categorical counterpart of [[StatsOps.qAuc]]'s rank view).
    * One aggregate over 50k-dollar bins (domain-bounded), totals
    * broadcast back; WOE uses the standard +0.5 Laplace smoothing so
    * empty-side bins stay finite, and IV contribution =
    * (g_i/G − b_i/B)·WOE. All counts exact longs; ln of a rational. */
  def qWoeIv(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val b = orders(s, d)
      .select(floor(col("o_totalprice") / 50000.0).cast("long").as("bin"),
        (col("o_orderstatus") === "F").cast("long").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("g"))
      .withColumn("b", col("n") - col("g"))
    val tot = b.agg(sum("g").as("gt"), sum("b").as("bt"))
    b.crossJoin(broadcast(tot))
      .select(col("bin"), (col("bin") * 50000L).as("lo_dollars"),
        col("n"), col("g").as("n_good"), col("b").as("n_bad"),
        r4(log((col("g") + 0.5) / (col("b") + 0.5)) -
          log(col("gt").cast("double") / col("bt"))).as("woe"),
        r4((col("g") / col("gt").cast("double") -
          col("b") / col("bt").cast("double")) *
          (log((col("g") + 0.5) / (col("b") + 0.5)) -
            log(col("gt").cast("double") / col("bt")))).as("iv_contrib"))
      .orderBy("bin")
  }

  /** Cramér's V association strength for nation × order-priority —
    * the normalized effect size the raw χ² of [[qChi2]] lacks
    * (χ² grows with N; V ∈ [0,1] is scale-free). The χ² sum is kept
    * CROSS-ENGINE EXACT by the micro-unit trick: each cell's
    * contribution (N·O − R·C)²/(N·R·C) is one deterministic double
    * expression over exact integer marginals (the difference fits a
    * double exactly at < 2^53; the square's IEEE rounding is
    * identical on identical inputs), floor-quantized to integer
    * micro-units per cell, then integer-summed — so accumulation
    * order can never flap the total. Zero-observed cells are
    * materialized by crossing the marginals, exactly as qChi2. */
  def qCramersV(s: SparkSession, d: String): DataFrame = {
    val obs = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "o_orderpriority")
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true) // table-sized; 3 marginals + cell join (r15)
    val rt = obs.groupBy("n_name").agg(sum("o").as("r"))
    val ct = obs.groupBy("o_orderpriority").agg(sum("o").as("c"))
    val g = obs.agg(sum("o").as("t"),
      countDistinct("n_name").as("nr"),
      countDistinct("o_orderpriority").as("nc"))
    val cells = rt.crossJoin(broadcast(ct)).crossJoin(broadcast(g))
      .join(obs, Seq("n_name", "o_orderpriority"), "left")
      .withColumn("o0", coalesce(col("o"), lit(0L)))
      // N·O and R·C are n²-scale count products (and N·R·C is n³) —
      // they wrap past ~3·10⁹ orders — so each multiplies double·long;
      // identical IEEE rounding both engines (q_spearman rule)
      .withColumn("diff",
        col("t").cast("double") * col("o0") -
          col("r").cast("double") * col("c"))
      .withColumn("contrib_u",
        floor(col("diff") * col("diff")
          / (col("t").cast("double") * col("r") * col("c")) * 1e6 + 0.5)
          .cast("long"))
    cells
      .groupBy("t", "nr", "nc")
      .agg(count(lit(1)).as("n_cells"), sum("contrib_u").as("chi2_u"))
      .select(
        col("t").as("n_orders"), col("n_cells"),
        (col("chi2_u") / 1e6).as("chi2"),
        (floor(sqrt(col("chi2_u") / 1e6
          / (col("t") * (least(col("nr"), col("nc")) - 1)).cast("double"))
          * 1e6 + 0.5) / 1e6).as("cramers_v"))
  }

  /** Audience-overlap matrix: per pair of event types, how many users
    * do both, with the exact Jaccard of the two audience sets — the
    * segment-overlap report every growth/ads pipeline keeps (do
    * clickers also purchase?). The per-type audience collapses to a
    * DISTINCT (type, user) table first, so the pair join is
    * audience-sized; intersection and union are exact integers
    * (|A∪B| = |A| + |B| − |A∩B|) and only the final Jaccard division
    * is a float, floor-rounded 6dp. */
  def qAudienceOverlap(s: SparkSession, d: String): DataFrame = {
    val au = events(s, d).select("event_type", "user_id").distinct()
      .localCheckpoint(true)
    val sizes = au.groupBy("event_type").agg(count(lit(1)).as("n"))
    val inter = au.toDF("ta", "user_id")
      .join(au.toDF("tb", "user_id"), "user_id")
      .filter(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("event_type").as("ta"), col("n").as("n_a")), "ta")
      .join(sizes.select(col("event_type").as("tb"), col("n").as("n_b")), "tb")
      .select(col("ta"), col("tb"), col("n_a"), col("n_b"), col("n_common"),
        (floor(col("n_common")
          / (col("n_a") + col("n_b") - col("n_common")).cast("double")
          * 1e6 + 0.5) / 1e6).as("jaccard"))
      .orderBy("ta", "tb")
  }

  /** Inter-event gap histogram per event type: the distribution of
    * seconds between a user's consecutive events of that type,
    * power-of-2 bucketed — the empirical input behind session-gap
    * and watermark sizing (q_lateness_audit measures disorder; this
    * measures cadence). Gaps are exact integer seconds from exact µs;
    * the bucket is the binary digit count (floor(log2) WITHOUT a
    * float log — the q_length_buckets idiom). One lag window keyed
    * (user, type) + one small aggregate. */
  def qGapHistogram(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    val gaps = events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag("us", 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap_s", expr("(us - prev) DIV 1000000"))
      .filter(col("gap_s") >= 1)
    gaps
      .groupBy(col("event_type"),
        (length(bin(col("gap_s"))) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min("gap_s").as("min_s"), max("gap_s").as("max_s"))
      .orderBy("event_type", "bucket")
  }

  /** ABC (Pareto) revenue classification of parts: A = parts covering
    * the first 80% of revenue, B = the next 15%, C = the tail — the
    * inventory-analysis staple. Revenue is the exact 1e-4-unit
    * discounted sum ([[Tables.moneySumDisc]]); the part aggregate
    * then collapses onto a whole-dollar revenue grid
    * (value-domain-bounded, never |parts|-sized) and the cumulative
    * window walks the GRID descending — revenue-tied parts share a
    * class (the previous per-part window split ties by partkey,
    * funneling |parts| rows through one task's sort at scale). The
    * two class boundaries stay INTEGER cross-multiplications
    * (cum·5 ≤ tot·4, cum·20 ≤ tot·19) so no float share ever decides
    * a class. */
  def qAbcClass(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .groupBy("l_partkey")
      .agg(moneySumDisc(col("l_extendedprice"), col("l_discount")).as("u"))
    val grid = rev.groupBy(expr("u DIV 10000").as("g"))
      .agg(count(lit(1)).as("np"), sum("u").as("gu"))
    val wc = Window.orderBy(col("g").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cum", sum("gu").over(wc))
      .withColumn("tot", sum("gu").over(Window.partitionBy()))
      .withColumn("cls",
        when(col("cum") * 5 <= col("tot") * 4, "A")
          .when(col("cum") * 20 <= col("tot") * 19, "B")
          .otherwise("C"))
      .groupBy("cls")
      .agg(sum("np").as("n_parts"), sum("gu").as("su"), max("tot").as("tot"))
      .select(col("cls"), col("n_parts"),
        unitsToDollarsExpr("su", 10000L).as("revenue"),
        floor(col("su") / col("tot").cast("double") * 1e6 + 0.5).cast("long")
          .as("share_u"))
      .orderBy("cls")
  }

  /** Cumulative gains / lift chart by spend decile — the marketing
    * targeting-eval staple ("the top 10% of spenders hold X% of
    * purchases"). Deciles are cut BY VALUE: the user aggregate
    * collapses onto a whole-dollar spend grid (value-domain-bounded,
    * never |users|-sized), each grid row's decile is the exact
    * integer ⌈cum·10/n⌉ of its last user under the descending-spend
    * order, and spend-tied users share a decile (the previous global
    * row_number split ties by user_id, funneling |users| rows through
    * one task's sort at scale). Shares and lift are floor-quantized
    * micro-units of exact integer counts; the cumulative sums run
    * over the ≤10-row decile table. */
  def qLiftGains(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d)
      .groupBy("user_id")
      .agg(sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("spend_c"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"))
    val grid = users.groupBy(expr("spend_c DIV 100").as("g"))
      .agg(count(lit(1)).as("nu"), sum("purchases").as("np"))
    val wCum = Window.orderBy(col("g").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val deciled = grid
      .withColumn("cum_n", sum("nu").over(wCum))
      .withColumn("tun", sum("nu").over(Window.partitionBy()))
      .withColumn("decile", expr("(cum_n * 10 + tun - 1) DIV tun"))
    val dec = deciled.groupBy("decile")
      .agg(sum("nu").as("n_users"), sum("np").as("n_purch"))
    val tot = dec.agg(sum("n_users").as("tu"), sum("n_purch").as("tp"))
    val wc = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec.crossJoin(broadcast(tot))
      .withColumn("cum_purch", sum("n_purch").over(wc))
      .withColumn("cum_users", sum("n_users").over(wc))
      .select(col("decile"), col("n_users"), col("n_purch"),
        floor(col("cum_purch") / col("tp").cast("double") * 1e6 + 0.5)
          .cast("long").as("cum_gain_u"),
        floor(col("cum_purch") / col("tp").cast("double")
          / (col("cum_users") / col("tu").cast("double")) * 1e4 + 0.5)
          .cast("long").as("lift_x10000"))
      .orderBy("decile")
  }

  /** Day-of-week × hour activity punchcard — the weekly-rhythm grid
    * every ops dashboard opens with. The day-of-week is a PURE
    * INTEGER formula on the epoch day ((days + 4) mod 7, 0 = Sunday;
    * 1970-01-01 was a Thursday) so both engines derive it without
    * any locale/week-start convention, and spend is exact cents.
    * One map-side-combinable aggregate to a ≤168-row grid. */
  def qPunchcard(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(
        expr("(unix_micros(ts) DIV 86400000000 + 4) % 7").as("dow"),
        expr("(unix_micros(ts) % 86400000000) DIV 3600000000").as("hour"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("c"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n"), sum("c").as("cents"))
      .orderBy("dow", "hour")

  /** Hourly OHLC bars per event type — the time-series candle
    * aggregation every market/telemetry pipeline runs. Values are
    * exact integer cents; open/close are picked by a (ts, event_id)
    * total order inside each (type, hour) partition, so first/last
    * can never flap on timestamp ties. The window partitions by
    * (type, hour) — micro-batch-sized slices, never a global sort —
    * and the mean is reported from the exact integer (Σcents, n)
    * pair. At 100 TB the same plan shuffles once on the composite
    * bucket key. */
  def qOhlcBars(s: SparkSession, d: String): DataFrame = {
    val base = events(s, d).select(
      col("event_type"), col("event_id"), col("ts"),
      unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"),
      round(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy("event_type", "hour_ts")
      .orderBy(col("ts"), col("event_id"))
    base
      .withColumn("rn_a", row_number().over(w))
      .withColumn("rn_d", row_number().over(
        Window.partitionBy("event_type", "hour_ts")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .groupBy("event_type", "hour_ts")
      .agg(
        count(lit(1)).as("n"),
        max(when(col("rn_a") === 1, col("cents"))).as("open_c"),
        max("cents").as("high_c"),
        min("cents").as("low_c"),
        max(when(col("rn_d") === 1, col("cents"))).as("close_c"),
        sum("cents").as("total_c"))
      .withColumn("mean_c",
        floor(col("total_c").cast("double") / col("n") + 0.5).cast("long"))
      .orderBy("event_type", "hour_ts")
  }

  /** Entry/exit-page report with bounce rate — the web-analytics
    * staple over gap-sessionized journeys ([[qSessionizeBatch]]'s
    * 30-minute gap convention): per (entry event, exit event) pair,
    * how many sessions start and end there and what share are
    * single-event bounces. One window pass to mark session starts,
    * one session-keyed aggregate using the deterministic (ts,
    * event_id) total order for first/last, one pair-keyed rollup —
    * the pair table is |types|² bounded at any log size. */
  def qEntryExit(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val e = events(s, d)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev", lag(col("ms"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("ms") - col("prev") > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("sess_n",
        sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    e.groupBy("user_id", "sess_n")
      .agg(count(lit(1)).as("n_events"),
        min(struct(col("ms"), col("event_id"), col("event_type")))
          .getField("event_type").as("entry"),
        max(struct(col("ms"), col("event_id"), col("event_type")))
          .getField("event_type").as("exit"))
      .groupBy("entry", "exit")
      .agg(count(lit(1)).as("n_sessions"),
        sum((col("n_events") === 1).cast("long")).as("n_bounces"))
      .withColumn("bounce_share",
        r4(col("n_bounces") / col("n_sessions").cast("double")))
      .orderBy("entry", "exit")
  }

  /** Token-bucket rate-limit audit — "how many of each user's
    * requests would a burst-3, 1-token-per-day quota have
    * admitted?": the capacity-planning replay every API team runs
    * before turning a limiter on. The bucket is GENUINELY
    * sequential state (each admission depends on the previous
    * decision), which makes this the documented legitimate use of
    * the mapPartitions last resort: repartition by user, sort within
    * partitions by (ts, event_id), and run the integer bucket
    * recurrence in one pass per partition — the state is one long
    * per in-flight user, users are partition-contiguous by
    * construction, and nothing ever collects. All arithmetic is
    * integer (elapsed seconds div 86400), so the DuckDB oracle replays
    * the recurrence exactly as a recursive CTE stepping row-rank by
    * row-rank across all users simultaneously. */
  def qRateLimit(s: SparkSession, d: String): DataFrame = {
    val cap = 3L
    val spark = s
    import spark.implicits._
    events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"), col("event_id"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "t_us", "event_id")
      .select(col("user_id").as("u"), expr("t_us div 1000000").as("t_s"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        var curUser = Long.MinValue
        var tokens = 0L
        var prevT = 0L
        it.map { case (u, t) =>
          if (u != curUser) { curUser = u; tokens = cap; prevT = t }
          else {
            tokens = math.min(cap, tokens + (t - prevT) / 86400L)
            prevT = t
          }
          val admitted = tokens > 0L
          if (admitted) tokens -= 1L
          (u, if (admitted) 1L else 0L)
        }
      }
      .toDF("user_id", "admitted")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum("admitted").as("n_admitted"),
        (count(lit(1)) - sum("admitted")).as("n_rejected"))
      .orderBy("user_id")
  }

  /** DuckDB oracle for [[qRateLimit]]: the identical integer bucket
    * recurrence as a recursive CTE — one step per per-user row rank,
    * all users advancing together. */
  val rateLimitOracleSql: String =
    """WITH RECURSIVE e AS (
      |  SELECT user_id,
      |         CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
      |              AS BIGINT) AS t_s,
      |         ROW_NUMBER() OVER (PARTITION BY user_id
      |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      |  FROM events),
      |s AS (
      |  SELECT user_id, rn, t_s,
      |         CAST(CASE WHEN 3 > 0 THEN 1 ELSE 0 END AS BIGINT) AS admitted,
      |         CAST(3 - 1 AS BIGINT) AS tokens_after
      |  FROM e WHERE rn = 1
      |  UNION ALL
      |  SELECT e.user_id, e.rn, e.t_s,
      |         CASE WHEN LEAST(3, s.tokens_after + (e.t_s - s.t_s) // 86400) > 0
      |              THEN 1 ELSE 0 END,
      |         LEAST(3, s.tokens_after + (e.t_s - s.t_s) // 86400) -
      |         CASE WHEN LEAST(3, s.tokens_after + (e.t_s - s.t_s) // 86400) > 0
      |              THEN 1 ELSE 0 END
      |  FROM s JOIN e ON e.user_id = s.user_id AND e.rn = s.rn + 1)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(admitted) AS BIGINT) AS n_admitted,
      |       CAST(COUNT(*) - SUM(admitted) AS BIGINT) AS n_rejected
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Markov removal-effect attribution (Anderl et al. 2014) — the
    * principled alternative to [[qAttribution]]'s last-touch rule:
    * fit the first-order journey chain, then for each channel ask
    * "how much conversion disappears if this channel vanishes?"
    * (remove its transitions WITHOUT renormalizing — lost mass IS
    * the channel's contribution). Reach-purchase probabilities come
    * from 8 synchronous value-iteration steps with purchase
    * absorbing, every step in exact ppm integers: r(s) ←
    * (Σ_t n_st·r(t)) div n_s, so engines cannot drift. The
    * CORPUS-side work is two aggregates (transition counts +
    * first-event counts); the chain itself is a model table bounded
    * by |channels|² — it collapses to the driver by the documented
    * bounded-model contract (≤25 rows at any corpus size; the same
    * iteration distributes over a states DataFrame if the state
    * space ever grew) and the 5-scenario × 8-step recursion runs in
    * exact integer Scala, replayed by an UNROLLED 40-CTE oracle
    * generated from the same loop bounds. */
  def qRemovalEffect(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val base = events(s, d).select("user_id", "event_type", "ts", "event_id")
    val tr = base
      .withColumn("dst", lead("event_type", 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val init = base
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("event_type").agg(count(lit(1)).as("n0"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val states = (tr.keys.flatMap(k => Seq(k._1, k._2)) ++ init.keys).toSeq.distinct.sorted
    val outs = states.map(s0 => s0 -> tr.collect {
      case ((src, _), n) if src == s0 => n
    }.sum).toMap
    val totalUsers = init.values.sum
    def convPpm(removed: Option[String]): Long = {
      var r = states.map(s0 =>
        s0 -> (if (s0 == "purchase") 1000000L else 0L)).toMap
      for (_ <- 0 until 8) {
        r = states.map { s0 =>
          s0 -> (
            if (s0 == "purchase") 1000000L
            else if (removed.contains(s0)) 0L
            else {
              val ns = outs(s0)
              if (ns == 0L) 0L
              else states.filterNot(removed.contains).map(t =>
                tr.getOrElse((s0, t), 0L) * r(t)).sum / ns
            })
        }.toMap
      }
      states.filterNot(removed.contains)
        .map(s0 => init.getOrElse(s0, 0L) * r(s0)).sum / totalUsers
    }
    val full = convPpm(None)
    val rows = ("none", full, 0L) +: states.filterNot(_ == "purchase").map { c =>
      val conv = convPpm(Some(c))
      // a slice with zero purchases makes the baseline 0 — report a
      // zero effect rather than divide (oracle mirrors the guard)
      (c, conv, if (full == 0L) 0L else 1000000L - conv * 1000000L / full)
    }
    val spark = s
    import spark.implicits._
    rows.toDF("removed_channel", "conv_ppm", "removal_effect_ppm")
      .orderBy("removed_channel")
  }

  /** DuckDB oracle for [[qRemovalEffect]]: the same 8 value-iteration
    * steps per scenario, UNROLLED as generated CTE chains (one per
    * removal scenario) over the transition and first-event counts —
    * integer ppm arithmetic end to end, so a drift anywhere in the
    * chain fit or the iteration breaks the compare. */
  lazy val removalEffectOracleSql: String = {
    val scens = Seq("none" -> None, "click" -> Some("click"),
      "error" -> Some("error"), "signup" -> Some("signup"),
      "view" -> Some("view"))
    def chain(tag: String, removed: Option[String]): String = {
      val rm = removed.map(c => s"AND tr.dst <> '$c' AND tr.src <> '$c'")
        .getOrElse("")
      val rmInit = removed.map(c => s"WHERE init.s <> '$c'").getOrElse("")
      val steps = (1 to 8).map { k =>
        val prev = if (k == 1) s"r_${tag}_0" else s"r_${tag}_${k - 1}"
        s"""r_${tag}_$k AS (
           |  SELECT st.s,
           |    CASE WHEN st.s = 'purchase' THEN CAST(1000000 AS BIGINT)
           |         ${removed.map(c => s"WHEN st.s = '$c' THEN CAST(0 AS BIGINT)").getOrElse("")}
           |         ELSE CAST(COALESCE(agg.v // outs.n_s, 0) AS BIGINT) END AS r
           |  FROM st
           |  LEFT JOIN (SELECT tr.src, SUM(tr.n * p.r) AS v
           |             FROM tr JOIN $prev p ON p.s = tr.dst
           |             WHERE 1=1 $rm GROUP BY tr.src) agg ON agg.src = st.s
           |  LEFT JOIN outs ON outs.src = st.s)""".stripMargin
      }.mkString(",\n")
      s"""r_${tag}_0 AS (
         |  SELECT s, CASE WHEN s = 'purchase' THEN CAST(1000000 AS BIGINT)
         |                 ELSE CAST(0 AS BIGINT) END AS r FROM st),
         |$steps,
         |conv_$tag AS (
         |  SELECT CAST(SUM(init.n0 * r.r) // (SELECT SUM(n0) FROM init)
         |              AS BIGINT) AS conv_ppm
         |  FROM init JOIN r_${tag}_8 r ON r.s = init.s $rmInit)""".stripMargin
    }
    val chains = scens.map { case (tag, rem) => chain(tag, rem) }.mkString(",\n")
    val selects = scens.map { case (tag, rem) =>
      val name = rem.getOrElse("none")
      if (rem.isEmpty)
        s"SELECT 'none' AS removed_channel, conv_ppm, CAST(0 AS BIGINT) AS removal_effect_ppm FROM conv_$tag"
      else
        s"""SELECT '$name', conv_$tag.conv_ppm,
           |  CAST(CASE WHEN conv_none.conv_ppm = 0 THEN 0
           |            ELSE 1000000 - conv_$tag.conv_ppm * 1000000
           |                 // conv_none.conv_ppm END
           |       AS BIGINT)
           |FROM conv_$tag, conv_none""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH pairs AS (
       |  SELECT user_id, event_type AS src,
       |         LEAD(event_type) OVER (PARTITION BY user_id
       |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
       |  FROM events),
       |tr AS (SELECT src, dst, COUNT(*) AS n FROM pairs
       |       WHERE dst IS NOT NULL GROUP BY 1, 2),
       |outs AS (SELECT src, SUM(n) AS n_s FROM tr GROUP BY 1),
       |st AS (SELECT DISTINCT event_type AS s FROM events),
       |init AS (
       |  SELECT event_type AS s, COUNT(*) AS n0 FROM (
       |    SELECT user_id, event_type, ROW_NUMBER() OVER (
       |      PARTITION BY user_id
       |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
       |    FROM events) f WHERE rn = 1 GROUP BY 1),
       |$chains
       |SELECT * FROM ($selects) ORDER BY removed_channel""".stripMargin
  }

  /** Empirical-Bayes rate shrinkage (beta-binomial, method of
    * moments) — the fix for every "this user converted 1-for-1 so
    * their rate is 100%" report: per-user purchase rates shrink
    * toward a Beta prior whose (α, β) are moment-matched from the
    * observed rate distribution itself. The moment estimation is the
    * float-order trap (a mean and variance over per-user RATIOS), so
    * each user's rate quantizes to an exact basis-point integer first
    * and the corpus-level Σr, Σr² are integer sums; α and β then derive
    * from two exact integers identically on both engines, and only
    * the final per-user shrink divides doubles. Plan: one user-level
    * aggregate, one 1-row moment aggregate broadcast back — the
    * two-pass shape at any log size. Degenerate variance (≤ 0 or
    * prior mass ≤ 0) falls back to the raw rate on both engines. */
  def qCtrSmoothing(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val perUser = events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "purchase").cast("long")).as("k"))
      // rates quantize to exact BASIS-POINT integers for the moment
      // pass: r_b ≤ 10⁴ keeps Σr_b² an exact long to ~9·10¹⁰ users
      // (the ppm grid wrapped Σr² at 9.2M users — a real corpus size)
      .withColumn("r_b", expr("(k * 10000) div n"))
    val moments = perUser.agg(
      count(lit(1)).as("n_users"),
      sum("r_b").as("sr"),
      sum(col("r_b") * col("r_b")).as("srr"))
    perUser.crossJoin(broadcast(moments))
      .withColumn("m", col("sr") / (col("n_users") * lit(1e4)))
      .withColumn("v",
        (col("srr") / col("n_users") -
          (col("sr") / col("n_users")) * (col("sr") / col("n_users"))) / lit(1e8))
      .withColumn("common",
        when(col("v") > 0, col("m") * (lit(1.0) - col("m")) / col("v") - 1.0)
          .otherwise(lit(0.0)))
      .withColumn("alpha", col("m") * col("common"))
      .withColumn("beta", (lit(1.0) - col("m")) * col("common"))
      .select(col("user_id"), col("n"), col("k"),
        r4(col("k") / col("n").cast("double")).as("raw_rate"),
        r4(when(col("common") > 0,
          (col("k") + col("alpha")) / (col("n") + col("alpha") + col("beta")))
          .otherwise(col("k") / col("n").cast("double"))).as("shrunk_rate"))
      .orderBy("user_id")
  }

  /** Offline policy evaluation via inverse-propensity scoring (IPS,
    * Horvitz–Thompson): "what would average reward be if we served
    * the purchase-preferring policy instead of what was logged?" —
    * answered from the log alone, the counterfactual eval every
    * recommendation/ranking team runs before an online A/B. Logged
    * propensities are the empirical action frequencies per user
    * segment μ(a|x) = n_xa/n_x; the target policy puts weight 3 on
    * `purchase` and 1 elsewhere over the segment's observed action
    * support. Algebra keeps everything integer-exact until one final
    * division: IPS_x = Σ_a [R_xa·w_a / n_xa] / W_x with each term
    * floor-scaled to exact micro-cent units, so the Σ_a sum (5
    * terms) cannot float-order-flap. Plan: one (segment, action)
    * hash aggregate — 20 groups at any log size — then a
    * segment-level re-aggregate; nothing bigger than the group
    * table ever shuffles. */
  def qIpsEval(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val perXA = events(s, d)
      .select((col("user_id") % 4).cast("long").as("segment"),
        col("event_type").as("action"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("r_c"))
      .groupBy("segment", "action")
      .agg(count(lit(1)).as("n_xa"), sum("r_c").as("rsum_c"))
      .withColumn("w", when(col("action") === "purchase", 3L).otherwise(1L))
      .withColumn("term_u", expr("(rsum_c * w * 1000000) div n_xa"))
    perXA
      .groupBy("segment")
      .agg(
        sum("n_xa").as("n_x"),
        count(lit(1)).as("n_actions"),
        sum("w").as("w_total"),
        sum("rsum_c").as("logged_c"),
        sum("term_u").as("ips_u"))
      .select(col("segment"), col("n_x"), col("n_actions"),
        r4(col("logged_c") / col("n_x").cast("double")).as("logged_avg_cents"),
        r4(col("ips_u") / (col("w_total") * 1000000L).cast("double"))
          .as("ips_avg_cents"))
      .orderBy("segment")
  }

  /** EXACT Shapley-value attribution over the 3-channel touch lattice
    * (Shapley 1953 applied to conversion credit — the principled
    * successor to last-touch (qAttribution) and the cooperative-game
    * counterpart of q_removal_effect's Markov view): each user's
    * touched-channel set {click, view, signup} is a 3-bit mask, the
    * coalition value v(S) = conversions of users whose touch set ⊆ S
    * (what S alone could have driven), and each channel's Shapley
    * value is the classic permutation-weighted sum of marginal
    * contributions. With n = 3 the weights are sixths, so 6·φᵢ =
    * 2[v({i})−v(∅)] + [v({i,j})−v({j})] + [v({i,k})−v({k})] +
    * 2[v(N)−v(N∖i)] — EXACT integer arithmetic end to end; the one
    * division (by 6) happens at output under r4. The corpus-sized
    * work is ONE user aggregate onto the 8-row mask table; v(S) is an
    * 8×8 bounded subset join, and efficiency (Σφᵢ = v(N) − v(∅)) is
    * pinned by spec. */
  def qShapleyAttribution(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val users = Tables.events(s, d).groupBy("user_id")
      .agg((max(when(col("event_type") === "click", 1L).otherwise(0L)) +
        max(when(col("event_type") === "view", 2L).otherwise(0L)) +
        max(when(col("event_type") === "signup", 4L).otherwise(0L))).as("mask"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
    val model = users.groupBy("mask").agg(sum("conv").as("n_conv"))
    val grid = (0L to 7L).toDF("s")
    val vS = model.crossJoin(broadcast(grid))
      .filter(col("mask").bitwiseAND(col("s")) === col("mask"))
      .groupBy("s").agg(sum("n_conv").as("v"))
    val vAggs = (0 to 7).map(i => max(when(col("s") === i, col("v"))).as(s"v$i"))
    val vrow = vS.groupBy().agg(vAggs.head, vAggs.tail: _*)
    def v(i: Int) = coalesce(col(s"v$i"), lit(0L))
    vrow.select(explode(array(
      struct(lit("click").as("channel"),
        (lit(2L) * (v(1) - v(0)) + (v(3) - v(2)) + (v(5) - v(4)) +
          lit(2L) * (v(7) - v(6))).as("sixths")),
      struct(lit("view").as("channel"),
        (lit(2L) * (v(2) - v(0)) + (v(3) - v(1)) + (v(6) - v(4)) +
          lit(2L) * (v(7) - v(5))).as("sixths")),
      struct(lit("signup").as("channel"),
        (lit(2L) * (v(4) - v(0)) + (v(5) - v(1)) + (v(6) - v(2)) +
          lit(2L) * (v(7) - v(3))).as("sixths")))).as("c"))
      .select(col("c.channel").as("channel"), col("c.sixths").as("sixths"))
      .withColumn("shapley", r4(col("sixths") / 6.0))
      .orderBy("channel")
  }

  /** DuckDB oracle for [[qShapleyAttribution]]: the identical mask
    * aggregate, subset-sum coalition values, and sixths formulas. */
  val shapleyAttributionOracleSql: String =
    """WITH u AS (SELECT user_id,
      |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |  + MAX(CASE WHEN event_type = 'view' THEN 2 ELSE 0 END)
      |  + MAX(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END) AS mask,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |m AS (SELECT mask, SUM(conv) AS n_conv FROM u GROUP BY mask),
      |g AS (SELECT UNNEST(range(8)) AS s),
      |vs AS (SELECT g.s, SUM(m.n_conv) AS v
      |       FROM m CROSS JOIN g WHERE (m.mask & g.s) = m.mask GROUP BY g.s),
      |p AS (SELECT
      |    COALESCE(MAX(CASE WHEN s = 0 THEN v END), 0) AS v0,
      |    COALESCE(MAX(CASE WHEN s = 1 THEN v END), 0) AS v1,
      |    COALESCE(MAX(CASE WHEN s = 2 THEN v END), 0) AS v2,
      |    COALESCE(MAX(CASE WHEN s = 3 THEN v END), 0) AS v3,
      |    COALESCE(MAX(CASE WHEN s = 4 THEN v END), 0) AS v4,
      |    COALESCE(MAX(CASE WHEN s = 5 THEN v END), 0) AS v5,
      |    COALESCE(MAX(CASE WHEN s = 6 THEN v END), 0) AS v6,
      |    COALESCE(MAX(CASE WHEN s = 7 THEN v END), 0) AS v7
      |  FROM vs),
      |out AS (
      |  SELECT 'click' AS channel,
      |    2 * (v1 - v0) + (v3 - v2) + (v5 - v4) + 2 * (v7 - v6) AS sixths FROM p
      |  UNION ALL
      |  SELECT 'view',
      |    2 * (v2 - v0) + (v3 - v1) + (v6 - v4) + 2 * (v7 - v5) FROM p
      |  UNION ALL
      |  SELECT 'signup',
      |    2 * (v4 - v0) + (v5 - v1) + (v6 - v2) + 2 * (v7 - v3) FROM p)
      |SELECT channel, CAST(sixths AS BIGINT) AS sixths,
      |       FLOOR(sixths / 6.0 * 10000.0 + 0.5) / 10000.0 AS shapley
      |FROM out ORDER BY channel""".stripMargin
}
