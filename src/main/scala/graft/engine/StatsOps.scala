package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical operators a data-quality / curation pipeline runs over
  * event streams and the order book: anomaly scoring, sequence
  * autocorrelation, inequality (Gini), two-sample testing, pair
  * co-occurrence, moving medians, RFM segmentation, Pareto skylines,
  * and geo distance. The reference has no aggregation surface at all
  * (SURVEY.md §2b) — these extend its buffered streams with the
  * second-order statistics the north star asks for.
  *
  * Scale shape: every operator reduces to (a) one shuffle on its
  * natural key and (b) arithmetic over a group-cardinality-sized
  * aggregate; no collects, no driver state, no cross-row loops.
  */
object StatsOps {
  import Tables._

  /** Z-score anomaly flags: per event type, mean/stddev of `value`
    * are computed in one aggregate pass (5 rows) and broadcast back
    * onto the stream, so the flagging filter is map-side — the same
    * two-stage shape as qOutlierIqr but parametric. Rows with
    * |z| > 3 survive; z is rounded after the filter. Degenerate
    * groups (σ = 0, a constant-valued type) are filtered explicitly
    * — division by zero is NULL in Spark but ±inf in DuckDB, so both
    * the op and the oracle exclude them by construction. */
  def qZscore(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val stats = e.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_samp("value").as("sigma"))
    e.join(broadcast(stats), "event_type")
      .filter(col("sigma") > 0)
      .withColumn("z", (col("value") - col("mu")) / col("sigma"))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"),
        round(col("z"), 3).as("z"))
      .orderBy("event_id")
  }

  /** Lag-1 autocorrelation of each user's value sequence: one window
    * pass pairs v with its predecessor (user_id shuffle), then a
    * plain corr aggregate per user — the periodicity probe for
    * sensor/behavioral streams. Users with <10 pairs are dropped
    * (corr is noise there). */
  def qAutocorr(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("prev_v", lag("value", 1).over(w))
      .filter(col("prev_v").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        round(corr(col("value"), col("prev_v")), 4).as("lag1_corr"))
      .filter(col("n_pairs") >= 10)
      .orderBy("user_id")
  }

  /** Gini coefficient of customer spend within each market segment —
    * the inequality measure a sampling strategy balances against.
    * Spend collapses to one row per customer first; the rank window
    * and both sums then run on that |customers|-sized table. Formula:
    * G = 2·Σ(i·xᵢ)/(n·Σxᵢ) − (n+1)/n over ascending spend (ties
    * broken by custkey; tied values make the formula order-
    * invariant). */
  def qGini(s: SparkSession, d: String): DataFrame = {
    val spend = orders(s, d)
      .groupBy("o_custkey").agg(sum("o_totalprice").as("spend"))
    val seg = customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("spend"), col("c_custkey"))
    spend.join(seg, col("o_custkey") === col("c_custkey"))
      .withColumn("i", row_number().over(w).cast("double"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        round(
          lit(2.0) * sum(col("i") * col("spend")) /
            (count(lit(1)) * sum("spend")) -
            (count(lit(1)) + lit(1.0)) / count(lit(1)), 4).as("gini"))
      .orderBy("c_mktsegment")
  }

  /** Welch's two-sample t-test: do purchase events carry a different
    * mean value than click events? Single conditional-aggregation
    * pass (CASE inside avg/var_samp/count) — one scan, one 1-row
    * result with the t statistic and Welch–Satterthwaite df. The
    * A/B-test readout shape: at 100 TB this is still one partial-agg
    * shuffle of 6 numbers. */
  def qTtest(s: SparkSession, d: String): DataFrame = {
    val a = when(col("event_type") === "purchase", col("value"))
    val b = when(col("event_type") === "click", col("value"))
    events(s, d)
      .agg(
        count(a).as("n1"), avg(a).as("m1"), var_samp(a).as("v1"),
        count(b).as("n2"), avg(b).as("m2"), var_samp(b).as("v2"))
      .select(
        col("n1"), col("n2"),
        round(col("m1") - col("m2"), 4).as("mean_diff"),
        round((col("m1") - col("m2")) /
          sqrt(col("v1") / col("n1") + col("v2") / col("n2")), 4).as("t_stat"),
        round(
          pow(col("v1") / col("n1") + col("v2") / col("n2"), 2) /
            (pow(col("v1") / col("n1"), 2) / (col("n1") - 1) +
             pow(col("v2") / col("n2"), 2) / (col("n2") - 1)), 2).as("welch_df"))
  }

  /** Event-type co-occurrence (market-basket over user sessions):
    * which pairs of types the same user exhibits, with lift =
    * P(a,b)/(P(a)·P(b)). The universe collapses to distinct
    * (user, type) rows — |users|×5 — before the pair self-join, so
    * the quadratic step runs on type-set-sized data, never raw
    * events; the per-type marginals are broadcast. */
  def qCooccur(s: SparkSession, d: String): DataFrame = {
    val ut = events(s, d).select("user_id", "event_type").distinct()
      // AUDIENCE-sized (|users| × ≤5 types), NOT vocabulary/grid-
      // bounded like most r15 checkpoints: it grows linearly with the
      // user base, so re-evaluate this materialization at a larger
      // scale factor (the ScaleOps/RelationalExt size-class
      // convention). Bench-verified a win at sf0.1; referenced by the
      // user count, the marginals and both self-join sides — dedup
      // the events once (the qAudienceOverlap pattern, r15)
      .localCheckpoint(true)
    val nUsers = ut.agg(countDistinct("user_id").cast("double").as("n_users"))
    val marg = ut.groupBy("event_type").agg(count(lit(1)).as("n_t"))
    val a = ut.toDF("user_id", "t_a")
    val b = ut.toDF("user_id", "t_b")
    a.join(b, "user_id")
      .filter(col("t_a") < col("t_b"))
      .groupBy("t_a", "t_b").agg(count(lit(1)).as("n_both"))
      .join(broadcast(marg.toDF("t_a", "n_a")), "t_a")
      .join(broadcast(marg.toDF("t_b", "n_b")), "t_b")
      .crossJoin(broadcast(nUsers))
      .select(col("t_a"), col("t_b"), col("n_both"),
        // n_a·n_b is a product of user counts — wraps past ~3·10⁹
        // users per type — so it multiplies double-led (n_users is
        // already double)
        round(col("n_both") * col("n_users") /
          (col("n_a").cast("double") * col("n_b")), 4).as("lift"))
      .orderBy("t_a", "t_b")
  }

  /** Moving median of `value` over each user's trailing 5 events —
    * the robust smoother a denoising pass prefers over moving
    * averages. Exact: the 5-row frame is collected per row (bounded
    * by the frame length, not the partition), sorted, and the median
    * interpolated for even-length frames — matching quantile_cont
    * semantics on both engines. */
  def qMovingMedian(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-4, 0)
    val sorted = array_sort(collect_list("value").over(w))
    val n = size(sorted)
    val med = when(n % 2 === 1, element_at(sorted, ((n + 1) / 2).cast("int")))
      .otherwise((element_at(sorted, (n / 2).cast("int")) +
        element_at(sorted, (n / 2 + 1).cast("int"))) / 2.0)
    events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("med5", round(med, 3))
      .select("event_id", "user_id", "med5")
      .orderBy("event_id")
  }

  /** RFM segmentation: per customer — Recency (days since last order,
    * vs the global max date), Frequency (order count), Monetary
    * (total spend) — each quartiled by VALUE against exact
    * equi-height boundaries, concatenated into the classic 3-digit
    * segment. No global ntile sort: each dimension's three quartile
    * cut points come from an integer value-domain histogram (days /
    * order counts / whole dollars — all bounded by the value range,
    * never by |customers|) via the ⌈n·k/4⌉ cross-multiplied rule
    * (the q_equiheight_hist pattern), the 1-row boundary tables
    * broadcast back, and every customer buckets map-side — value
    * ties share a quartile (the defensible segmentation semantics;
    * the previous custkey tie-split funneled 10⁸⁺ rows through one
    * task's sort at scale). */
  def qRfm(s: SparkSession, d: String): DataFrame = {
    val per = orders(s, d)
      .groupBy("o_custkey")
      .agg(max(col("o_orderdate").cast("date")).as("last_day"),
        count(lit(1)).as("freq"),
        sum("o_totalprice").as("monetary"),
        // whole-dollar grid for the monetary histogram (exact cents
        // sum, integer DIV — never a floored double sum)
        expr("CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))" +
          " DIV 100 AS BIGINT)").as("mon_d"))
      .localCheckpoint(true)
    val base = per
      .crossJoin(broadcast(per.agg(max("last_day").as("max_day"))))
      .withColumn("recency_days",
        datediff(col("max_day"), col("last_day")).cast("long"))
      .localCheckpoint(true)
    // exact ⌈n·k/4⌉ quartile boundaries from the value histogram:
    // b_k = smallest v with 4·cum(v) ≥ n·k  (cross-multiplied ints)
    def bounds(vals: DataFrame): DataFrame = {
      val wCum = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      vals.groupBy("v").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(wCum))
        .withColumn("n", sum("cnt").over(wAll))
        .agg(min(when(col("cum") * 4 >= col("n"), col("v"))).as("b1"),
          min(when(col("cum") * 4 >= col("n") * 2, col("v"))).as("b2"),
          min(when(col("cum") * 4 >= col("n") * 3, col("v"))).as("b3"))
    }
    def tileUp(x: Column, b: String): Column =
      lit(1L) + (x > col(s"$b.b1")).cast("long") +
        (x > col(s"$b.b2")).cast("long") + (x > col(s"$b.b3")).cast("long")
    base
      .crossJoin(broadcast(bounds(base.select(col("recency_days").as("v")))
        .select(struct(col("b1"), col("b2"), col("b3")).as("rb"))))
      .crossJoin(broadcast(bounds(base.select(col("freq").as("v")))
        .select(struct(col("b1"), col("b2"), col("b3")).as("fb"))))
      .crossJoin(broadcast(bounds(base.select(col("mon_d").as("v")))
        .select(struct(col("b1"), col("b2"), col("b3")).as("mb"))))
      // recency: smaller = better = bucket 4; freq/monetary: bigger = 4
      .withColumn("r", lit(5L) - tileUp(col("recency_days"), "rb"))
      .withColumn("f", tileUp(col("freq"), "fb"))
      .withColumn("m", tileUp(col("mon_d"), "mb"))
      .select(col("o_custkey").as("custkey"), col("recency_days"),
        col("freq"), round(col("monetary"), 2).as("monetary"),
        col("r"), col("f"), col("m"),
        (col("r") * 100 + col("f") * 10 + col("m")).as("rfm"))
      .orderBy("custkey")
  }

  /** Pareto skyline of the order book: orders not dominated on
    * (earlier-or-equal date, strictly higher price). With dominance
    * defined that way, a row is on the skyline iff its price equals
    * the running max over all orders dated ≤ its date. The raw
    * orders are first collapsed to a per-day max (one hash shuffle
    * on day, map-side-combinable), so the unpartitioned prefix-max
    * window runs on a CALENDAR-sized table (~2.4k rows for 7 years),
    * not the fact table — Spark funnels an unpartitioned window into
    * one task, which is only safe on bounded input. The fact rows
    * then broadcast-join the calendar-sized threshold back on. */
  def qSkyline(s: SparkSession, d: String): DataFrame = {
    val day = datediff(col("o_orderdate").cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    val base = orders(s, d)
      .select(col("o_orderkey"), day.as("day"), col("o_totalprice"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val threshold = base.groupBy("day")
      .agg(max("o_totalprice").as("dmax"))
      .withColumn("runmax", max("dmax").over(w))
      .select("day", "runmax")
    base.join(broadcast(threshold), "day")
      .filter(col("o_totalprice") === col("runmax"))
      .select(col("o_orderkey"), col("day"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy("day", "o_orderkey")
  }

  /** Haversine ring histogram: users are placed on a deterministic
    * lat/lon grid derived from user_id (the fixture has no geo
    * columns), distance to (0°,0°) is computed with the haversine
    * formula, and users are bucketed into 1000 km rings. Pure
    * map-side math + one 20-row aggregate; trig stays in doubles on
    * both engines and the outputs are rounded. */
  def qGeoDistance(s: SparkSession, d: String): DataFrame = {
    val u = events(s, d).select("user_id").distinct()
    val lat = (col("user_id") % 180 - 89.5) * math.Pi / 180.0
    val lon = ((col("user_id") * 7) % 360 - 179.5) * math.Pi / 180.0
    val dist = lit(2.0 * 6371.0) * asin(sqrt(
      pow(sin(lat / 2), 2) + cos(lat) * pow(sin(lon / 2), 2)))
    u.withColumn("dist_km", dist)
      .groupBy(floor(col("dist_km") / 1000).cast("long").as("ring"))
      .agg(count(lit(1)).as("n_users"),
        round(min("dist_km"), 1).as("min_km"),
        round(max("dist_km"), 1).as("max_km"))
      .orderBy("ring")
  }

  /** Point-in-polygon vertices for [[qPointInPolygon]] — a CONCAVE
    * hexagon on the 0..1000 integer lattice (concavity is what makes
    * ray casting non-trivial: a ray can cross the boundary 0, 2 or 4
    * times). */
  val PipPolygon: Seq[(Int, Int)] =
    Seq((100, 100), (900, 150), (700, 500), (850, 900), (400, 800), (150, 600))

  /** Point-in-polygon containment — the geofence primitive every
    * spatial join reduces to after cell pre-filtering (q_geo_grid_join
    * culls candidates; THIS test decides them): the crossing-number
    * ray cast (PNPOLY) against a concave hexagon, with the
    * division-free cross-multiplied form t = (px−x1)(y2−y1) −
    * (x2−x1)(py−y1) so every comparison is exact integer arithmetic —
    * no float anywhere, both engines land on identical toggles even
    * for on-edge lattice points. Points derive from user_id (the
    * qGeoDistance synthesis convention); the polygon is a 6-row
    * broadcast, crossings sum per user, parity decides. One corpus
    * pass, one user-cardinality aggregate, one 2-row rollup. */
  def qPointInPolygon(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val edges = PipPolygon.indices.map { i =>
      val (x1, y1) = PipPolygon(i)
      val (x2, y2) = PipPolygon((i + 1) % PipPolygon.size)
      (x1.toLong, y1.toLong, x2.toLong, y2.toLong)
    }.toDF("x1", "y1", "x2", "y2")
    // multiplicative spread (×131 / ×211, coprime to 1000): sequential
    // user ids cover the whole lattice instead of hugging the x<|users|
    // strip, so both parity classes materialize at every SF
    val pts = events(s, d).select("user_id").distinct()
      .select(col("user_id"), ((col("user_id") * 131) % 1000).as("px"),
        ((col("user_id") * 211) % 1000).as("py"))
    val t = (col("px") - col("x1")) * (col("y2") - col("y1")) -
      (col("x2") - col("x1")) * (col("py") - col("y1"))
    val crossing = ((col("y1") > col("py")) =!= (col("y2") > col("py"))) &&
      ((col("y2") > col("y1") && t < 0) || (col("y2") < col("y1") && t > 0))
    pts.crossJoin(broadcast(edges))
      .groupBy("user_id")
      .agg(sum(crossing.cast("long")).as("n_cross"))
      .select(col("user_id"), (col("n_cross") % 2 === 1).cast("long").as("inside"))
      .groupBy("inside")
      .agg(count(lit(1)).as("n_users"),
        min("user_id").as("min_user"), max("user_id").as("max_user"))
      .orderBy("inside")
  }

  /** DuckDB oracle for [[qPointInPolygon]]: the identical
    * division-free crossing test over the same 6 edges, generated
    * from the same vertex list. */
  lazy val pointInPolygonOracleSql: String = {
    val edgeRows = PipPolygon.indices.map { i =>
      val (x1, y1) = PipPolygon(i)
      val (x2, y2) = PipPolygon((i + 1) % PipPolygon.size)
      s"($x1, $y1, $x2, $y2)"
    }.mkString(", ")
    s"""WITH edges(x1, y1, x2, y2) AS (VALUES $edgeRows),
       |pts AS (SELECT DISTINCT user_id, (user_id * 131) % 1000 AS px,
       |               (user_id * 211) % 1000 AS py FROM events),
       |cr AS (SELECT p.user_id,
       |         SUM(CASE WHEN ((e.y1 > p.py) <> (e.y2 > p.py)) AND
       |           ((e.y2 > e.y1 AND (p.px - e.x1) * (e.y2 - e.y1)
       |              - (e.x2 - e.x1) * (p.py - e.y1) < 0) OR
       |            (e.y2 < e.y1 AND (p.px - e.x1) * (e.y2 - e.y1)
       |              - (e.x2 - e.x1) * (p.py - e.y1) > 0))
       |           THEN 1 ELSE 0 END) AS n_cross
       |       FROM pts p CROSS JOIN edges e GROUP BY p.user_id)
       |SELECT CAST(n_cross % 2 AS BIGINT) AS inside,
       |       CAST(COUNT(*) AS BIGINT) AS n_users,
       |       CAST(MIN(user_id) AS BIGINT) AS min_user,
       |       CAST(MAX(user_id) AS BIGINT) AS max_user
       |FROM cr GROUP BY 1 ORDER BY inside""".stripMargin
  }

  /** Geohash encoding (Niemeyer 2008) — the spatial bucketing key
    * every geo-partitioned lakehouse sorts by: user coordinates (the
    * [[qGeoDistance]] synthesis convention) quantize to 20 bits per
    * axis, interleave lon-first into a 40-bit cell id, and emit as
    * the standard 8-character base-32 string. The bit plumbing is
    * explicit integer shifts (a 20-term sum both engines evaluate
    * exactly — no float anywhere after the quantization floor), so
    * the hash is reproducible down to the last character. Output
    * groups by the 3-char prefix (~156 km cells): the coarse-cell
    * occupancy report a geo layout uses to pick partition
    * granularity. User-cardinality aggregate; the encode itself is a
    * map-side projection at any scale. */
  def qGeohashEncode(s: SparkSession, d: String): DataFrame = {
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    val u = events(s, d).select("user_id").distinct()
    val lat = col("user_id") % 180 - lit(89.5)
    val lon = (col("user_id") * 7) % 360 - lit(179.5)
    val latQ = least(floor((lat + 90.0) / 180.0 * 1048576.0),
      lit(1048575.0)).cast("long")
    val lonQ = least(floor((lon + 180.0) / 360.0 * 1048576.0),
      lit(1048575.0)).cast("long")
    // interleave: even bit positions (from MSB) take lon bits, odd take lat
    val h = (0 until 20).map { k =>
      (shiftleft(shiftright(lonQ, 19 - k).bitwiseAND(1L), 39 - 2 * k)) +
        (shiftleft(shiftright(latQ, 19 - k).bitwiseAND(1L), 38 - 2 * k))
    }.reduce(_ + _)
    val gh = concat((0 until 8).map { k =>
      lit(alphabet).substr(
        (shiftright(h, 35 - 5 * k).bitwiseAND(31L) + 1).cast("int"), lit(1))
    }: _*)
    u.withColumn("geohash", gh)
      .groupBy(substring(col("geohash"), 1, 3).as("cell"))
      .agg(count(lit(1)).as("n_users"),
        min("geohash").as("first_hash"), max("geohash").as("last_hash"))
      .orderBy("cell")
  }

  /** DuckDB oracle for [[qGeohashEncode]]: the identical 20-term
    * interleave and base-32 lookup, generated from the same loop
    * bounds so the two engines cannot drift on a shift constant. */
  lazy val geohashEncodeOracleSql: String = {
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    val terms = (0 until 20).map { k =>
      s"(((lon_q >> ${19 - k}) & 1) << ${39 - 2 * k}) + " +
        s"(((lat_q >> ${19 - k}) & 1) << ${38 - 2 * k})"
    }.mkString(" + ")
    val chars = (0 until 8).map { k =>
      s"substr('$alphabet', CAST(((h >> ${35 - 5 * k}) & 31) + 1 AS INTEGER), 1)"
    }.mkString(" || ")
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |q AS (SELECT user_id,
       |        CAST(LEAST(FLOOR(((user_id % 180 - 89.5) + 90.0)
       |          / 180.0 * 1048576.0), 1048575) AS BIGINT) AS lat_q,
       |        CAST(LEAST(FLOOR((((user_id * 7) % 360 - 179.5) + 180.0)
       |          / 360.0 * 1048576.0), 1048575) AS BIGINT) AS lon_q
       |      FROM u),
       |hh AS (SELECT user_id, $terms AS h FROM q),
       |g AS (SELECT user_id, $chars AS geohash FROM hh)
       |SELECT substr(geohash, 1, 3) AS cell,
       |       CAST(COUNT(*) AS BIGINT) AS n_users,
       |       MIN(geohash) AS first_hash, MAX(geohash) AS last_hash
       |FROM g GROUP BY 1 ORDER BY cell""".stripMargin
  }

  /** Exponentially weighted moving average (decay 0.5) over each
    * user's value sequence, as an EXPLICIT 5-term lag composition:
    * the fixed-depth form keeps the weights exact binary fractions
    * (1, .5, .25, .125, .0625 — no pow() drift), keeps the additions
    * in a deterministic left-to-right order both engines share, and
    * avoids the pow(a,row_number) reformulation that overflows on
    * long sequences. One window shuffle on user_id; everything else
    * is map-side. Partial leading windows renormalize by the weights
    * actually present. */
  def qEwma(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val weights = Seq(1.0, 0.5, 0.25, 0.125, 0.0625)
    val terms = weights.zipWithIndex.map { case (wt, i) =>
      val v = if (i == 0) col("value") else lag("value", i).over(w)
      (when(v.isNotNull, v * wt).otherwise(lit(0.0)),
       when(v.isNotNull, lit(wt)).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    events(s, d)
      .select(col("event_id"), col("user_id"),
        round(col("value"), 2).as("value"),
        round(num / den, 4).as("ewma"))
      .orderBy("event_id")
  }

  /** Median absolute deviation per event type — the robust spread
    * measure the z-score family (qZscore) is fragile without. Two
    * exact-median passes: per-type median (5-row dim, broadcast
    * back), then median of absolute deviations on the same
    * event_type partitioning. */
  def qMad(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val med = e.groupBy("event_type").agg(median(col("value")).as("med"))
    e.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(max("med"), 4).as("median_value"),
        round(median(col("adev")), 4).as("mad"))
      .orderBy("event_type")
  }

  /** Benford first-digit audit of the order book — the classic
    * anomaly screen for fabricated numeric data (a curation gate for
    * scraped tabular corpora). The leading digit comes from the
    * DECIMAL(12,2) string form (exact; no log10-of-double boundary
    * flap at powers of ten), shares are compared to the Benford
    * expectation log10(1+1/d). One map-side projection + a 9-row
    * aggregate. */
  def qBenford(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val digit = substring(
      col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2))
        .cast("string"), 1, 1)
    // total derives from the 9-row digit aggregate — never a second
    // scan of the fact table
    val counts = o.select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    counts
      .crossJoin(broadcast(counts.agg(sum("n").cast("double").as("total"))))
      .select(col("digit"), col("n"),
        round(col("n") / col("total"), 4).as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 4)
          .as("benford"))
      .orderBy("digit")
  }

  /** Two-proportion z-test (pooled) between click and view events,
    * conversion = value > 100 — the A/B significance readout. ONE
    * conditional-aggregation pass over the filtered stream (same
    * single-pass shape as qTtest), scalar math on the 1-row result.
    * Division/sqrt order matches the oracle exactly. */
  /** Heterogeneous-treatment-effect (uplift) segments — the
    * two-model/T-learner readout an experimentation stack layers over
    * a raw A/B result (qAbTest gives ONE average effect; uplift asks
    * WHERE it concentrates): users split into md5-derived treatment
    * arms (an A/A split here — the expected uplift is ≈0, which makes
    * the audit honest: anything large is noise the reader should see),
    * segmented by activity tercile, and per segment the treated and
    * control conversion rates are each floor-quantized to the 1e-4
    * grid BEFORE subtracting, so the uplift column is exact grid
    * arithmetic. One user aggregate + one segment aggregate. */
  def qUpliftSegments(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val u = events(s, d).groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .withColumn("segment",
        when(col("n_ev") < 62, lit("low"))
          .when(col("n_ev") < 71, lit("mid")).otherwise(lit("high")))
      .withColumn("t", conv(substring(md5(concat(col("user_id").cast("string"),
        lit(":up"))), 1, 8), 16, 10).cast("long") % 2)
    u.groupBy("segment")
      .agg(count(when(col("t") === 1, lit(1))).as("n_treat"),
        sum(when(col("t") === 1, col("y"))).as("y_treat"),
        count(when(col("t") === 0, lit(1))).as("n_ctrl"),
        sum(when(col("t") === 0, col("y"))).as("y_ctrl"))
      // tiny-SF guard: an empty arm reports rate 0 (both engines) so
      // the uplift column stays total
      .withColumn("rate_treat", when(col("n_treat") === 0, lit(0.0))
        .otherwise(r4(col("y_treat") / col("n_treat").cast("double"))))
      .withColumn("rate_ctrl", when(col("n_ctrl") === 0, lit(0.0))
        .otherwise(r4(col("y_ctrl") / col("n_ctrl").cast("double"))))
      .withColumn("uplift", col("rate_treat") - col("rate_ctrl"))
      .orderBy("segment")
  }

  /** DuckDB oracle for [[qUpliftSegments]]: the same md5 arms,
    * terciles, and quantize-then-subtract uplift. */
  val upliftSegmentsOracleSql: String =
    """WITH u AS (SELECT user_id, COUNT(*) AS n_ev,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      |  FROM events GROUP BY user_id),
      |seg AS (SELECT user_id, y,
      |    CASE WHEN n_ev < 62 THEN 'low'
      |         WHEN n_ev < 71 THEN 'mid' ELSE 'high' END AS segment,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':up'), 1, 8))::BIGINT % 2 AS t
      |  FROM u)
      |SELECT segment,
      |  CAST(COUNT(CASE WHEN t = 1 THEN 1 END) AS BIGINT) AS n_treat,
      |  CAST(SUM(CASE WHEN t = 1 THEN y END) AS BIGINT) AS y_treat,
      |  CAST(COUNT(CASE WHEN t = 0 THEN 1 END) AS BIGINT) AS n_ctrl,
      |  CAST(SUM(CASE WHEN t = 0 THEN y END) AS BIGINT) AS y_ctrl,
      |  CASE WHEN COUNT(CASE WHEN t = 1 THEN 1 END) = 0 THEN 0.0
      |    ELSE FLOOR(SUM(CASE WHEN t = 1 THEN y END)
      |      / CAST(COUNT(CASE WHEN t = 1 THEN 1 END) AS DOUBLE) * 10000.0 + 0.5)
      |      / 10000.0 END AS rate_treat,
      |  CASE WHEN COUNT(CASE WHEN t = 0 THEN 1 END) = 0 THEN 0.0
      |    ELSE FLOOR(SUM(CASE WHEN t = 0 THEN y END)
      |      / CAST(COUNT(CASE WHEN t = 0 THEN 1 END) AS DOUBLE) * 10000.0 + 0.5)
      |      / 10000.0 END AS rate_ctrl,
      |  (CASE WHEN COUNT(CASE WHEN t = 1 THEN 1 END) = 0 THEN 0.0
      |    ELSE FLOOR(SUM(CASE WHEN t = 1 THEN y END)
      |      / CAST(COUNT(CASE WHEN t = 1 THEN 1 END) AS DOUBLE) * 10000.0 + 0.5)
      |      / 10000.0 END)
      |  - (CASE WHEN COUNT(CASE WHEN t = 0 THEN 1 END) = 0 THEN 0.0
      |    ELSE FLOOR(SUM(CASE WHEN t = 0 THEN y END)
      |      / CAST(COUNT(CASE WHEN t = 0 THEN 1 END) AS DOUBLE) * 10000.0 + 0.5)
      |      / 10000.0 END) AS uplift
      |FROM seg GROUP BY segment ORDER BY segment""".stripMargin

  /** Randomization (permutation) test of the purchase-vs-click mean
    * value difference — the nonparametric significance machinery when
    * the t-test's normality assumption (qTtest/qAbTest) is off the
    * table: under H₀ labels are exchangeable, so re-labeling events
    * with md5-seeded coins and recomputing the statistic traces the
    * null distribution, and the p-value is the rank of the observed
    * stat within it ((1+#{perm ≥ obs})/(1+P), the standard
    * add-one-smoothed form). All 64 permutations compute in ONE pass:
    * the event table crosses a broadcast 64-row perm grid and a single
    * (perm, group) aggregate carries every resample — no loop, no
    * repeated scans. The statistic quantizes to micro-cent integers
    * (one IEEE division per group, floor) so cross-perm comparisons
    * are exact longs on both engines. */
  def qPermutationTest(s: SparkSession, d: String, nPerms: Int = 64): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    def statU(sa: Column, na: Column, sb: Column, nb: Column): Column =
      floor(abs(sa.cast("double") * 1e6 / na - sb.cast("double") * 1e6 / nb)
        + 0.5).cast("long")
    val ev = events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("vc"))
      .localCheckpoint(true) // one corpus scan feeds observed + all perms
    val obs = ev.agg(
        sum(when(col("event_type") === "purchase", col("vc"))).as("sa"),
        count(when(col("event_type") === "purchase", lit(1))).as("na"),
        sum(when(col("event_type") === "click", col("vc"))).as("sb"),
        count(when(col("event_type") === "click", lit(1))).as("nb"))
      .select(statU(col("sa"), col("na"), col("sb"), col("nb")).as("stat_obs_u"))
    val perms = ev
      .crossJoin(broadcast(s.range(nPerms).select(col("id").as("p"))))
      .withColumn("grp", conv(substring(md5(concat(
        col("event_id").cast("string"), lit(":"), col("p").cast("string"))),
        1, 8), 16, 10).cast("long") % 2)
      .groupBy("p")
      .agg(sum(when(col("grp") === 0, col("vc"))).as("sa"),
        count(when(col("grp") === 0, lit(1))).as("na"),
        sum(when(col("grp") === 1, col("vc"))).as("sb"),
        count(when(col("grp") === 1, lit(1))).as("nb"))
      .select(col("p"), statU(col("sa"), col("na"), col("sb"), col("nb"))
        .as("stat_p"))
    perms.crossJoin(broadcast(obs))
      .agg(max("stat_obs_u").as("stat_obs_u"),
        count(lit(1)).as("n_perms"),
        sum((col("stat_p") >= col("stat_obs_u")).cast("long")).as("n_ge"))
      .withColumn("p_value",
        r4((col("n_ge") + 1).cast("double") / (col("n_perms") + 1)))
  }

  /** DuckDB oracle for [[qPermutationTest]]: every md5 coin replayed,
    * the same micro-cent statistic and add-one p-value. */
  val permutationTestOracleSql: String =
    """WITH ev AS (SELECT event_id, event_type,
      |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
      |       FROM events WHERE event_type IN ('purchase', 'click')),
      |obs AS (SELECT CAST(FLOOR(ABS(
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN vc END) AS DOUBLE)
      |      * 1e6 / COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
      |    - CAST(SUM(CASE WHEN event_type = 'click' THEN vc END) AS DOUBLE)
      |      * 1e6 / COUNT(CASE WHEN event_type = 'click' THEN 1 END)) + 0.5)
      |    AS BIGINT) AS stat_obs_u FROM ev),
      |pg AS (SELECT ev.vc, g.p,
      |         ('0x' || substr(md5(CAST(ev.event_id AS VARCHAR) || ':' ||
      |           CAST(g.p AS VARCHAR)), 1, 8))::BIGINT % 2 AS grp
      |       FROM ev CROSS JOIN (SELECT UNNEST(range(64)) AS p) g),
      |perms AS (SELECT p, CAST(FLOOR(ABS(
      |    CAST(SUM(CASE WHEN grp = 0 THEN vc END) AS DOUBLE)
      |      * 1e6 / COUNT(CASE WHEN grp = 0 THEN 1 END)
      |    - CAST(SUM(CASE WHEN grp = 1 THEN vc END) AS DOUBLE)
      |      * 1e6 / COUNT(CASE WHEN grp = 1 THEN 1 END)) + 0.5)
      |    AS BIGINT) AS stat_p FROM pg GROUP BY p)
      |SELECT MAX(obs.stat_obs_u) AS stat_obs_u,
      |       CAST(COUNT(*) AS BIGINT) AS n_perms,
      |       CAST(SUM(CASE WHEN stat_p >= obs.stat_obs_u THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_ge,
      |       FLOOR((SUM(CASE WHEN stat_p >= obs.stat_obs_u THEN 1 ELSE 0 END) + 1)
      |         / CAST(COUNT(*) + 1 AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS p_value
      |FROM perms CROSS JOIN obs""".stripMargin

  def qAbTest(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).filter(col("event_type").isin("click", "view"))
    def cnt(t: String, conv: Boolean): Column = {
      val base = col("event_type") === t
      sum(when(if (conv) base && col("value") > 100 else base, 1L).otherwise(0L))
        .cast("double")
    }
    e.agg(
      cnt("click", conv = false).as("na"), cnt("click", conv = true).as("ca"),
      cnt("view", conv = false).as("nb"), cnt("view", conv = true).as("cb"))
      .select(
        col("na").cast("long").as("n_click"),
        col("ca").cast("long").as("conv_click"),
        col("nb").cast("long").as("n_view"),
        col("cb").cast("long").as("conv_view"),
        round(col("ca") / col("na"), 4).as("p_click"),
        round(col("cb") / col("nb"), 4).as("p_view"),
        round(
          (col("ca") / col("na") - col("cb") / col("nb")) /
            sqrt(((col("ca") + col("cb")) / (col("na") + col("nb"))) *
              (lit(1.0) - (col("ca") + col("cb")) / (col("na") + col("nb"))) *
              (lit(1.0) / col("na") + lit(1.0) / col("nb"))), 4).as("z"))
  }

  /** k-anonymity audit (Sweeney 2002) over the customer table's
    * quasi-identifier tuple (nation, market segment, account-balance
    * thousand-bucket): group sizes and a k≥5 flag per equivalence
    * class, the release gate a privacy review runs before shipping
    * training data containing user attributes. One map-side-combinable
    * hash aggregate — group cardinality is the QI-domain product
    * (nations × segments × buckets), bounded regardless of corpus
    * size. floor of an identical double is identical across engines,
    * so the bucket edge cannot flap. */
  def qKanonymity(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .groupBy(
        col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("k_anonymous", (col("n") >= 5).cast("int"))
      .orderBy("nation", "segment", "bal_bucket")

  /** Winsorized statistics per event type: clip `value` at the exact
    * discrete p05/p95 and report raw vs clipped means — the standard
    * outlier-robust normalization before reward/quality scores feed a
    * training mix. Values are quantized to integer cents FIRST, so
    * (a) the per-type quantile scan runs on the (type, cents)
    * HISTOGRAM — domain-bounded, same size at 100 TB — not on raw
    * events, and (b) every sum downstream is an exact integer (no
    * float accumulation-order flap). Thresholds (10 rows) broadcast
    * back onto the stream; the clip + final moments are one map-side
    * pass. Quantile convention: smallest cents value whose cumulative
    * count reaches ceil(f·n) — qQuantileDisc's pick, restated on the
    * histogram. */
  def qWinsorize(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val cents = events(s, d)
      .select(col("event_type"), floor(col("value") * 100.0 + 0.5).cast("long").as("c"))
    val hist = cents.groupBy("event_type", "c").agg(count(lit(1)).as("hn"))
    val wCum = Window.partitionBy("event_type").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("event_type")
    val th = hist
      .withColumn("cum", sum("hn").over(wCum))
      .withColumn("n", sum("hn").over(wAll))
      .groupBy("event_type")
      .agg(
        min(when(col("cum") >= ceil(lit(0.05) * col("n")), col("c"))).as("lo"),
        min(when(col("cum") >= ceil(lit(0.95) * col("n")), col("c"))).as("hi"))
    cents.join(broadcast(th), "event_type")
      .withColumn("w", least(greatest(col("c"), col("lo")), col("hi")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        (max("lo") / 100.0).as("p05"),
        (max("hi") / 100.0).as("p95"),
        r4(sum("c") / (count(lit(1)) * 100.0)).as("mean_raw"),
        r4(sum("w") / (count(lit(1)) * 100.0)).as("mean_winsor"))
      .orderBy("event_type")
  }

  /** Deterministic Poisson bootstrap CI for the mean purchase value:
    * each (row, resample) pair draws a Poisson(1) weight by pushing a
    * uniform md5 hash through the inverse CDF — the standard
    * streaming/distributed bootstrap (no resampled copies of the
    * data; Poisson(1) counts approximate multinomial resampling), and
    * hash-drawn so every engine, re-run and partitioning sees the
    * SAME resamples. B=50 weighted means, CI = the 3rd and 48th
    * order statistics (~p05/p95). The fan-out is B× the FILTERED
    * rows (one event type), aggregated map-side into B groups; the
    * order-statistic window runs on 50 rows. */
  def qBootstrapCi(s: SparkSession, d: String, b: Int = 50): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    // inverse CDF of Poisson(1) at the cumulative probabilities
    // e^{-1}·Σ 1/k!: 0.3679, 0.7358, 0.9197, 0.9810, 0.9963, 0.9994
    val u = conv(substring(md5(concat_ws(":", col("event_id"), col("r"))),
      1, 8), 16, 10).cast("double") / 4294967296.0
    val w = when(u < 0.3679, 0).when(u < 0.7358, 1).when(u < 0.9197, 2)
      .when(u < 0.9810, 3).when(u < 0.9963, 4).when(u < 0.9994, 5)
      .otherwise(6)
    val means = events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("value"),
        explode(sequence(lit(0), lit(b - 1))).as("r"))
      .withColumn("w", w)
      .groupBy("r")
      .agg((sum(col("w") * col("value")) / sum("w")).as("m"),
        count(lit(1)).as("n"))
    val ranked = means
      .withColumn("rn", row_number().over(Window.orderBy("m")))
    ranked.agg(
      max("n").as("n_rows"),
      count(lit(1)).as("n_resamples"),
      r4(avg("m")).as("mean_of_means"),
      r4(max(when(col("rn") === 3, col("m")))).as("ci_lo"),
      r4(max(when(col("rn") === 48, col("m")))).as("ci_hi"))
  }

  /** Hill estimator of the tail index: α = k / Σ ln(x_i / x_{k+1})
    * over the top-k order statistics — the heavy-tail exponent that
    * decides whether mean-based monitors are even meaningful for a
    * metric (α ≤ 2 ⇒ infinite variance). The top-(k+1) selection is
    * a distributed TakeOrderedAndProject on exact integer cents
    * (ties at the boundary contribute ln(1) = 0, so tie-breaking
    * cannot change the estimate); the log-sum runs on k+1 rows. */
  def qTailIndex(s: SparkSession, d: String, k: Int = 100): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val top = events(s, d)
      .filter(col("event_type") === "purchase")
      .select(round(col("value") * 100).cast("long").as("c"),
        col("event_id"))
      .orderBy(col("c").desc, col("event_id"))
      .limit(k + 1)
    val xk1 = top.agg(min("c").as("ck1"))
    // strictly-above-boundary rows: a multiset condition, so the
    // estimate cannot depend on which boundary-tied row made the cut
    top.crossJoin(broadcast(xk1))
      .filter(col("c") > col("ck1"))
      .agg(count(lit(1)).as("n_top"),
        sum(log(col("c") / col("ck1").cast("double"))).as("lsum"),
        max(col("ck1")).as("ck1"))
      .select(col("n_top"),
        (col("ck1") / 100.0).as("x_boundary"),
        r4(col("n_top") / col("lsum")).as("alpha"))
  }

  /** Mergeable-statistics law check (Chan et al. parallel variance):
    * per event type, variance computed DIRECTLY from global integer
    * sums vs variance MERGED from two partition-local summaries
    * (n, Σ, M2) via M2 = M2a + M2b + δ²·na·nb/n — the algebra that
    * lets a 1000-executor cluster combine per-partition statistics
    * without a second pass. All inputs are exact integer cents; the
    * float algebra runs on 2 summary rows per type, so both engines
    * trace identical doubles and the reported merge error (zero in
    * exact arithmetic, float dust here) rounds away identically. */
  def qStatsMerge(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    def r6(x: Column): Column = floor(x * 1e6 + 0.5) / 1e6
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    val halves = events(s, d)
      .select(col("event_type"), (col("ts") >= cut).cast("int").as("h"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy("event_type", "h")
      .agg(count(lit(1)).as("n"), sum("c").as("s"),
        sum(col("c") * col("c")).as("ss"))
      // s² is the square of an aggregated cent sum — wraps past ~$30M
      // per (type, half), so it is computed double·long (q_spearman rule)
      .withColumn("m2",
        col("ss") - col("s").cast("double") * col("s") / col("n"))
    val merged = halves.groupBy("event_type").agg(
      sum("n").as("n"), sum("s").as("s"), sum("ss").as("ss"),
      // Chan's merge of the two per-half M2s (cents²)
      (sum("m2") +
        (max(when(col("h") === 0, col("s"))) / max(when(col("h") === 0, col("n"))).cast("double") -
          max(when(col("h") === 1, col("s"))) / max(when(col("h") === 1, col("n"))).cast("double"))
          * (max(when(col("h") === 0, col("s"))) / max(when(col("h") === 0, col("n"))).cast("double") -
            max(when(col("h") === 1, col("s"))) / max(when(col("h") === 1, col("n"))).cast("double"))
          * max(when(col("h") === 0, col("n"))) * max(when(col("h") === 1, col("n")))
          / sum("n").cast("double")).as("m2_merged"))
    merged.select(col("event_type"), col("n"),
      r4(col("s") / (col("n") * 100.0)).as("mean"),
      r4((col("ss") - col("s").cast("double") * col("s") / col("n"))
        / ((col("n") - 1) * 10000.0)).as("var_direct"),
      r4(col("m2_merged") / ((col("n") - 1) * 10000.0)).as("var_merged"),
      r6(abs(col("m2_merged") -
        (col("ss") - col("s").cast("double") * col("s") / col("n")))
        / ((col("n") - 1) * 10000.0)).as("merge_err"))
      .orderBy("event_type")
  }

  /** Leave-one-out target encoding (the categorical-feature staple):
    * each event's category (event_type) is replaced by the mean
    * target value of all OTHER events in that category — LOO removes
    * the self-leakage that makes naive target encoding overfit. The
    * category stats are a 5-row aggregate broadcast back onto the
    * facts (never a window over raw rows — a category partition is
    * unbounded at 100 TB); the per-row encode is exact integer cents
    * with one final division. Reported for a bounded sample (first
    * 100 event ids) so the output stays fixture-sized. */
  def qTargetEncoding(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val ev = events(s, d)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("c"))
    val stats = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("sum_c"))
    ev.join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"),
        (col("c") / 100.0).as("value"),
        when(col("n") > 1,
          r4((col("sum_c") - col("c")) / ((col("n") - 1) * 100.0)))
          .otherwise(lit(null).cast("double")).as("loo_mean"))
      .orderBy("event_id")
      .limit(100)
  }

  /** Per-group min-max feature scaling: value → (v − min)/(max − min)
    * within its event type, the normalization step before features
    * feed a model. Same broadcast-stats shape as the target encoder
    * (5-row aggregate joined back, no raw-row window); constant
    * groups scale to NULL rather than dividing by zero. Bounded
    * sample output (first 100 event ids). */
  def qGroupScale(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val ev = events(s, d)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("c"))
    val stats = ev.groupBy("event_type")
      .agg(min("c").as("mn"), max("c").as("mx"))
    ev.join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"),
        (col("c") / 100.0).as("value"),
        when(col("mx") > col("mn"),
          r4((col("c") - col("mn")) / (col("mx") - col("mn")).cast("double")))
          .otherwise(lit(null).cast("double")).as("scaled"))
      .orderBy("event_id")
      .limit(100)
  }

  /** Train/test split leakage audit: split the event log at a date
    * boundary (the standard temporal split) and measure user overlap
    * — the leakage that silently inflates eval metrics when the same
    * user's behavior spans both sides. Two distinct-user aggregates
    * plus their intersection, all user-cardinality-bounded; the
    * boundary date is a literal so both sides partition-prune. */
  def qSplitLeakage(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val cut = lit("2024-01-21 00:00:00").cast("timestamp")
    val ev = events(s, d)
    val train = ev.filter(col("ts") < cut).select("user_id").distinct()
    val test = ev.filter(col("ts") >= cut).select("user_id").distinct()
    val overlap = train.join(test, "user_id")
    train.agg(count(lit(1)).as("n_train_users"))
      .crossJoin(broadcast(test.agg(count(lit(1)).as("n_test_users"))))
      .crossJoin(broadcast(overlap.agg(count(lit(1)).as("n_overlap"))))
      .select(col("n_train_users"), col("n_test_users"), col("n_overlap"),
        r4(col("n_overlap") / col("n_test_users").cast("double"))
          .as("leakage_rate"))
  }

  /** ROC AUC of "transaction value predicts purchase" via the
    * Mann-Whitney U rank statistic — the classifier-eval primitive a
    * quality-filter pipeline runs to grade each candidate signal.
    * HISTOGRAM-FIRST: scores quantize to integer cents, so the rank
    * walk runs on the (cents) histogram — domain-bounded (~49k rows
    * at any corpus size; the unpartitioned window is deliberate and
    * safe for exactly that reason) — and ties collapse into one
    * histogram row whose shared midrank is the closed form
    * 2·midrank = 2·rank_min + n − 1. Everything up to the final
    * division is exact integer arithmetic (2·R₊ = Σ n₊·2midrank), so
    * AUC = (2R₊ − n₊(n₊+1)) / (2·n₊·n₋) is one deterministic
    * long-ratio division — no float accumulation anywhere. */
  def qAuc(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val h = events(s, d)
      .select(floor(col("value") * 100.0 + 0.5).cast("long").as("c"),
        (col("event_type") === "purchase").cast("long").as("y"))
      .groupBy("c")
      .agg(count(lit(1)).as("n"), sum("y").as("np"))
    val w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    h.withColumn("cum", sum("n").over(w))
      .select(col("n"), col("np"),
        (lit(2L) * (col("cum") - col("n") + 1L) + col("n") - 1L).as("mr2"))
      .agg(
        sum("np").as("n_pos"),
        (sum("n") - sum("np")).as("n_neg"),
        sum(col("np") * col("mr2")).as("r2"))
      .select(col("n_pos"), col("n_neg"),
        // n₊(n₊+1) is an n²-scale product of counts — wraps past
        // ~3·10⁹ positives — so it is computed double·long
        // (q_spearman rule; 2R₊ itself is exact to n·n₊ ≈ 4.6·10¹⁸)
        r4((col("r2") - col("n_pos").cast("double") * (col("n_pos") + 1L)) /
          (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic between the purchase and
    * click value distributions — the distribution-drift gate that
    * complements qPsiDrift (binned) with the exact sup-norm ECDF
    * distance. Same histogram-first shape as [[qAuc]]: both ECDFs are
    * running sums over the shared cents histogram, and the sup is
    * taken over CROSS-MULTIPLIED integer counts (|cum₁·N₂ − cum₂·N₁|)
    * so no division happens until the single final ratio — exact at
    * any scale, immune to float accumulation order. The max and its
    * location come from one struct-max aggregate (largest diff,
    * smallest cents on ties). */
  def qKsTest(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val h = events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .select(floor(col("value") * 100.0 + 0.5).cast("long").as("c"),
        (col("event_type") === "purchase").cast("long").as("y"))
      .groupBy("c")
      .agg(sum("y").as("n1"), (count(lit(1)) - sum("y")).as("n2"))
      .localCheckpoint(true) // domain-sized; totals + cumsum pass (r15)
    val w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    val tot = h.agg(sum("n1").as("t1"), sum("n2").as("t2"))
    h.withColumn("cum1", sum("n1").over(w))
      .withColumn("cum2", sum("n2").over(w))
      .crossJoin(broadcast(tot))
      .select(col("t1"), col("t2"),
        // cum·t cross-products are n²-scale — wrap past ~3·10⁹ rows
        // per class — so they multiply double·long (q_spearman rule);
        // both engines compute the identical doubles, so the argmax
        // ordering stays engine-stable
        abs(col("cum1").cast("double") * col("t2") -
          col("cum2").cast("double") * col("t1")).as("dnum"),
        col("c"))
      .groupBy("t1", "t2")
      .agg(max(struct(col("dnum"), (-col("c")).as("negc"))).as("m"))
      .select(
        col("t1").as("n_purchase"), col("t2").as("n_click"),
        r4(col("m.dnum") / (col("t1").cast("double") * col("t2"))).as("ks_stat"),
        (-col("m.negc") / 100.0).as("ks_at"))
  }

  /** One-way ANOVA of transaction value across event types — the
    * "does this categorical feature matter" screen run before
    * per-category models are fit. ONE conditional-aggregate pass
    * collects per-group (n, Σc, Σc²) in exact integer cents (bound:
    * Σc² wraps past ~9·10⁸ rows per group at c ≈ 10⁵ cents — beyond
    * that, shard the pass and merge 128-bit), and the F statistic
    * assembles on the group-cardinality-sized table:
    * SSB = Σ s_g²/n_g − S²/N, SSW = Σ ss_g − Σ s_g²/n_g,
    * F = (SSB/(k−1)) / (SSW/(N−k)). The n⁴-scale squares of the
    * aggregated sums (s_g², S²) are computed double·long — they pass
    * 2⁶³ at ~$30M group revenue (the q_spearman rule). */
  def qAnova(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val g = events(s, d)
      .select(col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("ng"), sum("c").as("sg"),
        sum(col("c") * col("c")).as("ssg"))
    // sg² / stot² are squares of aggregated cent SUMS — they pass 2⁶³
    // once a group's revenue exceeds ~$30M, so each square is computed
    // double·long (sg converts exactly below 2⁵³; both engines round
    // the product identically — the q_spearman rule)
    g.agg(
      count(lit(1)).as("k"),
      sum("ng").as("n"),
      sum(col("sg").cast("double") * col("sg") / col("ng")).as("between_raw"),
      sum("sg").as("stot"),
      sum("ssg").as("sstot"))
      .select(col("k"), col("n"),
        (col("k") - 1L).as("df_between"),
        (col("n") - col("k")).as("df_within"),
        r4(((col("between_raw") - col("stot").cast("double") * col("stot") / col("n")) / (col("k") - 1L)) /
          ((col("sstot") - col("between_raw")) / (col("n") - col("k")))).as("f_stat"))
  }

  /** Autocorrelation-function sweep: ACF at lags 1–5 of each event
    * type's DAILY mean value series — the periodicity profile
    * (a weekly cycle shows as a lag-7 ridge, ours samples the short
    * lags) that decides seasonal adjustment before drift monitors
    * run. The fact table collapses to a calendar-sized daily series
    * first (one hash shuffle; the mean is exact-integer cents over
    * n, so both engines see bit-identical series values), then ONE
    * window pass emits all five lags and an unpivot + corr aggregate
    * finishes on (type × lag) groups. All post-collapse work is
    * calendar-bounded — at 100 TB only the first aggregate touches
    * the facts. */
  def qAcfSweep(s: SparkSession, d: String): DataFrame = {
    val day = to_date(col("ts"))
    val daily = events(s, d)
      .groupBy(col("event_type"), day.as("day"))
      .agg((sum(expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)"))
        .cast("double") / count(lit(1)) / 100.0).as("v"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val lagged = daily.select(
      col("event_type"), col("v"),
      lag("v", 1).over(w).as("v1"), lag("v", 2).over(w).as("v2"),
      lag("v", 3).over(w).as("v3"), lag("v", 4).over(w).as("v4"),
      lag("v", 5).over(w).as("v5"))
    lagged
      .select(col("event_type"), col("v"),
        expr("stack(5, 1, v1, 2, v2, 3, v3, 4, v4, 5, v5) AS (lag_k, vlag)"))
      .filter(col("vlag").isNotNull)
      .groupBy("event_type", "lag_k")
      .agg(count(lit(1)).as("n_pairs"),
        round(corr(col("v"), col("vlag")), 4).as("acf"))
      .select(col("event_type"), col("lag_k").cast("int").as("lag_k"),
        col("n_pairs"), col("acf"))
      .orderBy("event_type", "lag_k")
  }

  /** Difference-in-differences estimate — the quasi-experimental
    * workhorse when treatment wasn't randomized per user-time:
    * treatment arm = user_id parity, periods split at the exact
    * integer-µs midpoint of the purchase stream, metric = mean
    * purchase cents. All four cell means come from exact integer
    * (Σcents, n) pairs, so the DiD point estimate is one
    * deterministic double expression. One aggregate over the facts
    * (4 cells) + a broadcast of the 1-row time bounds. */
  def qDiffInDiff(s: SparkSession, d: String): DataFrame = {
    val p = events(s, d).filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).as("arm"), unix_micros(col("ts")).as("us"),
        expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)").as("c"))
    val bounds = p.agg(expr("CAST((MIN(us) + MAX(us)) DIV 2 AS BIGINT)").as("mid"))
    val cells = p.crossJoin(broadcast(bounds))
      .withColumn("post", (col("us") >= col("mid")).cast("int"))
      .groupBy("arm", "post")
      .agg(count(lit(1)).as("n"), sum("c").as("sc"))
      .withColumn("mean_c", col("sc").cast("double") / col("n"))
    def cell(a: Int, po: Int, c: String) =
      max(when(col("arm") === a && col("post") === po, col(c)))
    cells.agg(
        cell(1, 0, "n").as("n_t_pre"), cell(1, 1, "n").as("n_t_post"),
        cell(0, 0, "n").as("n_c_pre"), cell(0, 1, "n").as("n_c_post"),
        cell(1, 0, "mean_c").as("m_t_pre"), cell(1, 1, "mean_c").as("m_t_post"),
        cell(0, 0, "mean_c").as("m_c_pre"), cell(0, 1, "mean_c").as("m_c_post"))
      .select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
        (floor(col("m_t_pre") * 100.0 + 0.5) / 100.0).as("mean_t_pre"),
        (floor(col("m_t_post") * 100.0 + 0.5) / 100.0).as("mean_t_post"),
        (floor(col("m_c_pre") * 100.0 + 0.5) / 100.0).as("mean_c_pre"),
        (floor(col("m_c_post") * 100.0 + 0.5) / 100.0).as("mean_c_post"),
        (floor(((col("m_t_post") - col("m_t_pre"))
          - (col("m_c_post") - col("m_c_pre"))) * 100.0 + 0.5) / 100.0)
          .as("did_cents"))
  }

  /** CUPED variance reduction (Deng et al. 2013) — the pre-experiment
    * covariate adjustment every experimentation platform applies
    * before reading a metric: per user, x = pre-period spend, y =
    * post-period spend (exact integer cents), θ = cov(x,y)/var(x)
    * from EXACT integer moment sums, and the adjusted metric's
    * variance shrinks by exactly ρ². The whole statistic is one
    * per-user aggregate (the only fact-scale shuffle) + one 1-row
    * moment collapse; every sum is integer-exact so both engines
    * compute the identical doubles. */
  def qCuped(s: SparkSession, d: String): DataFrame = {
    val p = events(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)").as("c"))
    val bounds = p.agg(expr("CAST((MIN(us) + MAX(us)) DIV 2 AS BIGINT)").as("mid"))
    val perUser = p.crossJoin(broadcast(bounds))
      .groupBy("user_id")
      .agg(sum(when(col("us") < col("mid"), col("c")).otherwise(0L)).as("x"),
        sum(when(col("us") >= col("mid"), col("c")).otherwise(0L)).as("y"))
    perUser.agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      // combine the (exact) sums in DOUBLE: n·Σxy would overflow
      // int64 at larger corpora, and DuckDB's HUGEINT sums would then
      // silently diverge — double(n)·double(Σxy) rounds identically
      // in both engines instead
      .withColumn("vx", col("n").cast("double") * col("sxx")
        - col("sx").cast("double") * col("sx"))
      .withColumn("vy", col("n").cast("double") * col("syy")
        - col("sy").cast("double") * col("sy"))
      .withColumn("cxy", col("n").cast("double") * col("sxy")
        - col("sx").cast("double") * col("sy"))
      .select(col("n"),
        (floor(col("cxy") / col("vx") * 1e6 + 0.5) / 1e6).as("theta"),
        (floor(col("cxy") / sqrt(col("vx")) / sqrt(col("vy")) * 1e6 + 0.5) / 1e6)
          .as("rho"),
        (floor(col("cxy") * col("cxy") / (col("vx") * col("vy")) * 1e4 + 0.5)
          / 1e4).as("variance_reduction"))
  }

  /** Sequential probability ratio test (Wald's SPRT) per experiment
    * arm — the always-valid sequential A/B monitor that stops the
    * moment the evidence crosses a boundary instead of waiting for a
    * fixed n: clicks ordered by event_id are Bernoulli trials
    * (conversion = value > 100), H₀: p = 0.10 vs H₁: p = 0.15,
    * boundaries ±ln(19) (α = β = 0.05). Each observation's
    * log-likelihood increment is one of TWO constants, quantized
    * once to micro-nats — the running LLR is an exact integer
    * cumsum, so the first-crossing observation and the decision are
    * engine-exact. One window pass per arm; the per-arm sequence is
    * the data, so the cumsum partitioning is the experiment's own
    * granularity. */
  def qSprt(s: SparkSession, d: String): DataFrame = {
    // micro-nat constants pinned as literals (ln(1.5), ln(17/18),
    // ln(19)) so both engines share the exact integers
    val succU = 405465L
    val failU = -57158L
    val boundU = 2944439L
    val w = Window.partitionBy("arm").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val llr = events(s, d)
      .filter(col("event_type") === "click")
      .select((col("user_id") % 2).as("arm"), col("event_id"),
        when(col("value") > 100, lit(succU)).otherwise(lit(failU)).as("inc_u"))
      .withColumn("llr_u", sum("inc_u").over(w))
    llr.groupBy("arm")
      .agg(
        count(lit(1)).as("n_obs"),
        min(when(col("llr_u") >= boundU, col("event_id"))).as("up_id"),
        min(when(col("llr_u") <= -boundU, col("event_id"))).as("dn_id"),
        sum("inc_u").as("final_llr_u"))
      .select(col("arm"), col("n_obs"),
        coalesce(col("up_id"), lit(-1L)).as("first_cross_up"),
        coalesce(col("dn_id"), lit(-1L)).as("first_cross_dn"),
        col("final_llr_u"),
        when(col("up_id").isNotNull &&
            (col("dn_id").isNull || col("up_id") < col("dn_id")), "accept_h1")
          .when(col("dn_id").isNotNull, "accept_h0")
          .otherwise("continue").as("decision"))
      .orderBy("arm")
  }

  /** Classical additive seasonal decomposition of each event type's
    * daily total: trend = centered 7-day moving average (full
    * windows only), seasonal = day-of-week mean of the detrended
    * series, residual = what's left — the STL-style split a
    * seasonality-aware monitor runs before alerting on raw deltas
    * (q_seasonal_dow's index is the multiplicative cousin; this is
    * the additive decomposition with an explicit trend removal).
    * The fact table collapses to calendar-sized daily cents first;
    * every later step is integer-exact (trend = 7-day sum DIV 7 on
    * nonneg totals; seasonal and residual means quantized via
    * FLOOR(x + .5) of an integer/count ratio — identical doubles in
    * both engines, no ordered float accumulation anywhere). Output:
    * the 5×7 seasonal profile with residual magnitude per cell. */
  def qSeasonalDecompose(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)")).as("cents"))
    val w7 = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-3, 3)
    val detr = daily
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("s7", sum("cents").over(w7))
      .filter(col("n7") === 7)
      .withColumn("trend_u", expr("CAST(s7 DIV 7 AS BIGINT)"))
      .withColumn("detr", col("cents") - col("trend_u"))
      .withColumn("dow", dayofweek(col("day")).cast("int"))
    val seasonal = detr.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"), sum("detr").as("sd"))
      .withColumn("seasonal_cents",
        floor(col("sd").cast("double") / col("n_days") + 0.5).cast("long"))
    detr.join(seasonal.select("event_type", "dow", "seasonal_cents"),
        Seq("event_type", "dow"))
      .withColumn("resid", col("detr") - col("seasonal_cents"))
      .groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"),
        max("seasonal_cents").as("seasonal_cents"),
        floor(sum(abs(col("resid"))).cast("double") / count(lit(1)) + 0.5)
          .cast("long").as("mean_abs_resid"))
      .orderBy("event_type", "dow")
  }

  /** Holt linear-trend double exponential smoothing (α = 0.5,
    * β = 0.25) of each event type's daily total — the level+trend
    * forecaster monitoring stacks run where a single EWMA lags a
    * drifting series. The recurrence is inherently sequential, but
    * the SERIES is calendar-bounded: the fact table collapses to
    * exact-integer daily cents first (the only corpus-sized shuffle),
    * and the fold runs as ONE aggregate() lambda over the per-type
    * sorted array — no driver loop, no window, parallel across
    * types. The oracle replays the identical recurrence as a
    * recursive CTE; both engines execute the same IEEE expression
    * tree in the same order, so the unrounded state matches
    * bit-for-bit. Init: l₂ = v₂, b₂ = v₂ − v₁ (standard). Output:
    * final level/trend and the 7-day-ahead forecast. */
  def qHoltLinear(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val day = to_date(col("ts"))
    val daily = events(s, d)
      .groupBy(col("event_type"), day.as("day"))
      .agg(sum(expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)")).as("cents"))
      .select(col("event_type"), col("day"),
        (col("cents").cast("double") / 100.0).as("v"))
    val st = daily.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("day"), col("v")))).as("xs"))
      .filter(size(col("xs")) >= 3)
      .select(col("event_type"), size(col("xs")).cast("long").as("n_days"),
        aggregate(
          slice(col("xs"), lit(3), size(col("xs")) - 2),
          struct(
            col("xs")(1)("v").as("lvl"),
            (col("xs")(1)("v") - col("xs")(0)("v")).as("trd")),
          (acc, x) => {
            val lvl2 = lit(0.5) * x("v") + lit(0.5) * (acc("lvl") + acc("trd"))
            val trd2 = lit(0.25) * (lvl2 - acc("lvl")) + lit(0.75) * acc("trd")
            struct(lvl2.as("lvl"), trd2.as("trd"))
          }).as("st"))
    st.select(col("event_type"), col("n_days"),
        r4(col("st")("lvl")).as("level"),
        r4(col("st")("trd")).as("trend"),
        r4(col("st")("lvl") + lit(7.0) * col("st")("trd")).as("forecast_7d"))
      .orderBy("event_type")
  }

  /** Binary-segmentation changepoint (one split) per event type on
    * the daily spend series: the split t maximizing the SSE reduction
    * S_L²/n_L + S_R²/n_R − S²/n (the Σx² term cancels, so only
    * PREFIX SUMS are needed). The corpus collapses to the exact-cents
    * daily table first; the candidate scan is then one calendar-sized
    * window pass. Every candidate's gain is the same double
    * expression over exact integer prefix sums — identical inputs +
    * identical IEEE ops = identical doubles in both engines — and the
    * argmax breaks ties by earliest index, so the chosen split can
    * never flap. */
  def qChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val wAll = Window.partitionBy("event_type")
    val gained = daily
      .withColumn("idx", row_number().over(w).cast("long"))
      .withColumn("cs", sum("x").over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("st", sum("x").over(wAll))
      .filter(col("idx") < col("n"))
      .withColumn("gain",
        // Never square a long sum: cast the left operand to double
        // first (exact — |cs| < 2^53), so the product is a correctly
        // rounded double instead of silently wrapping past 2^63 under
        // non-ANSI mode at ~30× this scale. Oracle mirrors
        // CAST(x AS DOUBLE) * x.
        (col("cs").cast("double") * col("cs")) / col("idx").cast("double")
          + ((col("st") - col("cs")).cast("double") * (col("st") - col("cs")))
            / (col("n") - col("idx")).cast("double")
          - (col("st").cast("double") * col("st")) / col("n").cast("double"))
    gained
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("gain").desc, col("idx").asc)))
      .filter(col("rk") === 1)
      .select(
        col("event_type"), col("day").as("split_day"),
        col("idx").as("n_left"), (col("n") - col("idx")).as("n_right"),
        (floor(col("cs") / col("idx").cast("double") + 0.5)).cast("long")
          .as("mean_left_c"),
        (floor((col("st") - col("cs"))
          / (col("n") - col("idx")).cast("double") + 0.5)).cast("long")
          .as("mean_right_c"),
        floor(col("gain") / 100.0).cast("long").as("gain_floor"))
      .orderBy("event_type")
  }

  /** Seasonal-naive forecast evaluation per event type: forecast(day)
    * = actual(day − 7), the baseline every real forecaster must beat
    * (Hyndman & Athanasopoulos, "Forecasting: Principles and
    * Practice"). Errors are EXACT integer cents (|x − x₋₇|), the
    * per-day percentage errors are floor-quantized micro-units, and
    * both means are integer half-up divisions — nothing float
    * accumulates. One daily aggregate + one lag window on the
    * calendar-sized series. */
  def qForecastBaseline(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("f", lag("x", 7).over(w))
      .filter(col("f").isNotNull && col("x") > 0)
      .withColumn("abs_err", abs(col("x") - col("f")))
      .withColumn("ape_u",
        floor(col("abs_err") / col("x").cast("double") * 1e6 + 0.5).cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        sum("abs_err").as("sum_abs_err_c"),
        sum("ape_u").as("sum_ape_u"))
      .select(
        col("event_type"), col("n_days"), col("sum_abs_err_c"),
        expr("(sum_abs_err_c + n_days DIV 2) DIV n_days").as("mae_c"),
        expr("(sum_ape_u + n_days DIV 2) DIV n_days").as("mape_u"))
      .orderBy("event_type")
  }

  /** Pinball (quantile) loss of the seasonal-naive forecast at
    * q = 0.5 and q = 0.9 — the eval that turns [[qForecastBaseline]]
    * from a point-forecast report into a quantile one (every capacity
    * planner cares about the P90 miss, not the mean miss). With the
    * error in exact cents and both quantiles on the 1/10 grid,
    * 10× the pinball loss is EXACTLY max(10q·d, 10(q−1)·d) with
    * integer coefficients {5,−5} / {9,−1}: the whole sweep is
    * integer arithmetic until one final mean. Same single-window
    * plan as the baseline eval; the quantile grid rides along as a
    * 2-row explode. */
  def qPinballLoss(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("f", lag("x", 7).over(w))
      .filter(col("f").isNotNull)
      .withColumn("d", col("x") - col("f"))
      .select(col("event_type"), col("d"),
        explode(array(lit(5L), lit(9L))).as("q10"))
      .withColumn("pin10_c",
        greatest(col("q10") * col("d"), (col("q10") - 10L) * col("d")))
      .groupBy("event_type", "q10")
      .agg(count(lit(1)).as("n_days"), sum("pin10_c").as("total_pin10_c"))
      .select(col("event_type"),
        r4(col("q10") / lit(10.0)).as("quantile"),
        col("n_days"), col("total_pin10_c"),
        r4(col("total_pin10_c") / (col("n_days") * lit(10.0)))
          .as("mean_pinball_c"))
      .orderBy("event_type", "quantile")
  }

  /** Leave-one-day-out jackknife standard error of the conversion-
    * rate RATIO estimator (purchases / events) — the classic
    * jackknife use case: a ratio's naive binomial SE is wrong
    * because both numerator and denominator vary by day (Efron &
    * Tibshirani ch. 11; the delete-one-group form every experiment
    * platform ships next to its bootstrap). Complements
    * q_bootstrap_ci with the deterministic resampling alternative.
    * Each leave-one-out rate θ₍d₎ = (P−p_d)/(N−n_d) is an exact
    * integer rational, floor-quantized to micro-units per day; the
    * pseudo-value variance then comes from exact integer moment sums
    * (D·Σx² − (Σx)², the q_spearman trick), so only the final sqrt
    * touches floats. One daily aggregate — calendar-sized state. */
  def qJackknife(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
    val tot = daily.agg(sum("n").as("nn"), sum("p").as("pp"),
      count(lit(1)).as("dd"))
    val x = daily.crossJoin(broadcast(tot))
      .filter(col("nn") > col("n"))
      .select(floor((col("pp") - col("p"))
        / (col("nn") - col("n")).cast("double") * 1e6 + 0.5)
        .cast("long").as("x"))
    x.agg(count(lit(1)).as("d_days"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .crossJoin(broadcast(tot))
      .select(
        col("d_days"),
        col("nn").as("n_events"), col("pp").as("n_purchases"),
        floor(col("pp") / col("nn").cast("double") * 1e6 + 0.5).cast("long")
          .as("rate_u"),
        // (d−1)·(d·sxx − sx²) is d³·10¹²-scale with µ-unit rates — it
        // wraps past ~2100 days, so each factor multiplies in double
        // (q_spearman rule; sxx itself is calendar- and ppm-bounded:
        // exact until d_days > 9.2·10⁶)
        floor(sqrt((col("d_days") - 1).cast("double")
          * (col("d_days").cast("double") * col("sxx") -
             col("sx").cast("double") * col("sx")))
          / col("d_days") + 0.5).cast("long").as("se_jack_u"))
  }

  /** Brown–Forsythe variance-homogeneity test across event types
    * (Levene's test with the MEDIAN center — the robust variant):
    * the companion every ANOVA needs, since q_anova's F assumes equal
    * variances. Group medians are exact-cents discrete picks (the
    * ceil(q·n) ranking rule q_quantile_disc pins); the absolute
    * deviations are exact integers; and both the between- and
    * within-group sums of squares are assembled from per-group
    * integer moments, micro-quantized per group then integer-summed
    * (the q_cramers_v pattern), so only the final ratio is a float.
    * One ranked pass for medians + one aggregate — two shuffles on
    * the type key. */
  def qLevene(s: SparkSession, d: String): DataFrame = {
    val cents = events(s, d).select(col("event_type"), col("event_id"),
      floor(col("value") * 100.0 + 0.5).cast("long").as("c"))
    val w = Window.partitionBy("event_type").orderBy(col("c"), col("event_id"))
    val wAll = Window.partitionBy("event_type")
    val med = cents
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .groupBy("event_type")
      .agg(max(when(col("rn") === ceil(lit(0.5) * col("n")).cast("long"),
        col("c"))).as("med"))
    val z = cents.join(med, "event_type")
      .select(col("event_type"), abs(col("c") - col("med")).as("z"))
    // r15 note: checkpointing g (referenced by tot + the crossJoin)
    // was measured SLOWER (0.69 -> 0.93 s) — the eager job costs more
    // than the two cheap narrow events re-scans it saves
    val g = z.groupBy("event_type")
      .agg(count(lit(1)).as("ni"), sum("z").as("si"),
        sum(col("z") * col("z")).as("qi"))
    val tot = g.agg(sum("ni").as("nn"), sum("si").as("ss"),
      count(lit(1)).as("k"))
    g.crossJoin(broadcast(tot))
      .select(col("nn"), col("k"),
        // between: n_i·(z̄_i − z̄)² quantized to centi-units per group
        // (coarser than micro on purpose: the sums of squares are up
        // to ~1e15 at sf0.1, so a 1e6 scale would overflow the long;
        // both engines quantize identically and the scale cancels in
        // the final ratio). si² is evaluated as double·long — si is
        // < 2^53-exact, so the product is the correctly-rounded true
        // square in BOTH engines (DuckDB mirrors the cast; its
        // BIGINT·BIGINT would raise on overflow).
        floor(col("ni")
          * (col("si") / col("ni").cast("double")
            - col("ss") / col("nn").cast("double"))
          * (col("si") / col("ni").cast("double")
            - col("ss") / col("nn").cast("double")) * 1e2 + 0.5)
          .cast("long").as("b_c"),
        // within: Σz² − S_i²/n_i in centi-units, exact per group
        floor((col("qi") - col("si").cast("double") * col("si")
          / col("ni").cast("double"))
          * 1e2 + 0.5).cast("long").as("w_c"))
      .groupBy("nn", "k")
      .agg(sum("b_c").as("sb_c"), sum("w_c").as("sw_c"))
      .select(col("k").as("n_groups"), col("nn").as("n_events"),
        col("sb_c"), col("sw_c"),
        (floor((col("nn") - col("k")).cast("double") / (col("k") - 1)
          * col("sb_c") / col("sw_c") * 1e4 + 0.5) / 1e4).as("bf_w"))
  }

  /** Overdispersion audit of the daily event-count series per type:
    * Fano factor (variance / mean) and the index-of-dispersion
    * statistic (d−1)·Var/mean, which is χ²_{d−1} under the Poisson
    * hypothesis — the model check behind q_burst_detect's 3σ rule
    * (a Poisson alert threshold on an overdispersed series
    * false-alarms constantly). All moments are exact integer sums
    * over the calendar-sized daily table; the two ratios are single
    * deterministic double expressions, floor-rounded 4dp. */
  def qFano(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("x"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("d_days"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("d_days") > 1 && col("sx") > 0)
      // d_days·sxx and sx² are products of aggregated daily-count
      // sums — sx² wraps past ~3·10⁹ total events per type — so each
      // is computed double·long (q_spearman rule; sxx itself stays an
      // exact long until a single day exceeds ~3·10⁹ events)
      .select(col("event_type"), col("d_days"), col("sx").as("n_events"),
        (floor((col("d_days").cast("double") * col("sxx") -
            col("sx").cast("double") * col("sx"))
          / (col("d_days") * (col("d_days") - 1)).cast("double")
          / (col("sx") / col("d_days").cast("double")) * 1e4 + 0.5) / 1e4)
          .as("fano"),
        (floor((col("d_days").cast("double") * col("sxx") -
            col("sx").cast("double") * col("sx"))
          / (col("d_days") * (col("d_days") - 1)).cast("double")
          / (col("sx") / col("d_days").cast("double"))
          * (col("d_days") - 1).cast("double") * 1e4 + 0.5) / 1e4)
          .as("dispersion_stat"))
      .orderBy("event_type")
  }

  /** Bollinger bands on the daily spend series per event type:
    * trailing-20-day mean ± 2σ with breach flags — the volatility
    * envelope monitor time-series ops run on throughput and spend
    * alike. The corpus collapses to an exact-integer-cents DAILY
    * table first (one map-side-combinable aggregate), so the
    * trailing window runs on calendar-sized input — the same
    * pre-aggregate-then-window shape as qSeasonalDecompose. All
    * window sums are exact integers; mean and σ are single
    * deterministic double expressions from (n, Σx, Σx²); the breach
    * test compares EXACT INTEGERS cross-multiplied — 19·(20x − S)² >
    * 1600·(20Σx² − S²) ⇔ (x − mean)² > 4σ² — evaluated in double
    * (operands < 2^53-exact inputs, identical IEEE rounding both
    * engines), so the flag can never flap on float dust. */
  def qBollinger(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-19, 0)
    daily
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("sx", sum("x").over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .filter(col("cnt") === 20)
      .withColumn("lhs",
        (lit(20.0) * col("x") - col("sx")) * (lit(20.0) * col("x") - col("sx")) * 19.0)
      // sx² as double·long (matching the oracle's CAST(sx AS DOUBLE) *
      // sx), never long·long: sx² is already ~5.5e15 at sf0.1 and a
      // long product wraps at scale while the oracle's double doesn't.
      .withColumn("rhs",
        lit(1600.0) * (lit(20.0) * col("sxx") - col("sx").cast("double") * col("sx")))
      .select(
        col("event_type"), col("day"), col("x").as("close_c"),
        (floor(col("sx") / 20.0 * 1e4 + 0.5) / 1e4).as("mean_c"),
        (floor(sqrt((lit(20.0) * col("sxx") - col("sx").cast("double") * col("sx"))
          / (20.0 * 19.0)) * 1e4 + 0.5) / 1e4).as("sigma_c"),
        (col("lhs") > col("rhs") &&
          col("x") * 20L > col("sx")).as("breach_hi"),
        (col("lhs") > col("rhs") &&
          col("x") * 20L < col("sx")).as("breach_lo"))
      .orderBy("event_type", "day")
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — the release
    * gate that catches what [[qKanonymity]] misses: a k-anonymous
    * equivalence class whose SENSITIVE attribute is uniform still
    * leaks it. Quasi-identifiers here are (nation,
    * account-balance-thousand bucket); the sensitive attribute is the
    * market segment. Per class: size, distinct sensitive values, the
    * l≥3 flag, and the modal-share numerator/denominator as exact
    * integers (the entropy/recursive variants threshold on the modal
    * share — reported as a rational, never a float division of
    * counts). Group cardinality is the QI-domain product, bounded at
    * any corpus size; the modal count is a max over a (class,
    * segment)-grouped subaggregate — two map-side-combinable hash
    * aggregates, no window over raw rows. */
  def qLDiversity(s: SparkSession, d: String): DataFrame = {
    val perSeg = customer(s, d)
      .groupBy(
        col("c_nationkey").cast("long").as("nation"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bucket"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("seg_n"))
    perSeg
      .groupBy("nation", "bal_bucket")
      .agg(
        sum("seg_n").as("n"),
        count(lit(1)).as("distinct_sensitive"),
        max("seg_n").as("modal_count"))
      .withColumn("l_diverse", (col("distinct_sensitive") >= 3).cast("int"))
      .orderBy("nation", "bal_bucket")
  }

  /** ε-differential-privacy release mechanism with SEEDED Laplace
    * noise — the third member of the privacy family
    * ([[qKanonymity]], [[qLDiversity]]): per-event-type counts
    * released through the standard Laplace(1/ε) mechanism, but with
    * the uniform draw derived from md5(key) instead of an RNG, so
    * the released table is reproducible and the mechanism itself is
    * differentially testable (a seeded mechanism is what a privacy
    * team uses to UNIT-TEST noise calibration; production swaps the
    * hash for a real RNG without touching the query shape). The
    * inverse-CDF transform: u ∈ [−0.499999, 0.499999] from the hash
    * (the ±0.5 endpoints that would blow up ln(0) are unreachable by
    * construction), noise = −b·sign(u)·ln(1−2|u|) with b = 1/ε.
    * Counts aggregate exactly; the one float op (ln) is IEEE-evaluated
    * on an exactly-representable rational in both engines. Sensitivity
    * of a disjoint count partition is 1, so every released count uses
    * the full budget — ε accounting rides along per row. */
  def qDpNoise(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val eps = 1.0
    val counts = events(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("true_n"))
    val u = ((conv(substring(md5(col("event_type")), 1, 8), 16, 10)
      .cast("long") % 999999L) + 1L - 500000L).cast("double") / 1e6
    counts
      .withColumn("u", u)
      .withColumn("noise",
        lit(-1.0 / eps) * signum(col("u")) *
          log(lit(1.0) - lit(2.0) * abs(col("u"))))
      .select(col("event_type"), col("true_n"),
        r4(col("noise")).as("noise"),
        floor(col("true_n") + col("noise") + 0.5).cast("long").as("released_n"),
        lit(eps).as("epsilon"))
      .orderBy("event_type")
  }

  /** Consistent pseudonymization audit — the de-identification step a
    * pipeline runs before user-keyed data leaves the trust boundary:
    * every user_id maps through a salted keyed hash to an 8-hex token,
    * and the audit proves the two properties that make pseudonymized
    * data still analyzable: (1) cardinality is preserved up to
    * measured collisions (distinct tokens + collisions = distinct
    * users — the birthday-bound check for the chosen token width),
    * and (2) re-keying events by token conserves the event count
    * exactly (referential integrity survives the mapping). One
    * distinct-user aggregate (user-cardinality sized, not row-sized)
    * and one re-keyed count — the same two-aggregate shape at any log
    * size. */
  def qPseudonymize(s: SparkSession, d: String): DataFrame = {
    val tokened = events(s, d)
      .select(col("user_id"),
        substring(md5(concat(lit("graft-salt-v1:"),
          col("user_id").cast("string"))), 1, 8).as("token"))
    val users = tokened.groupBy("user_id")
      .agg(first("token").as("token"), count(lit(1)).as("n_ev"))
    users.agg(
      count(lit(1)).as("n_users"),
      countDistinct(col("token")).as("n_tokens"),
      (count(lit(1)) - countDistinct(col("token"))).as("n_collisions"),
      sum("n_ev").as("n_events"))
      .crossJoin(broadcast(
        tokened.groupBy("token").agg(count(lit(1)).as("c"))
          .agg(sum("c").as("n_events_via_token"))))
      .withColumn("lossless",
        (col("n_events") === col("n_events_via_token")).cast("int"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the top of
    * the privacy-release ladder ([[qKanonymity]] → [[qLDiversity]] →
    * here): an l-diverse class whose sensitive-value MIX still differs
    * sharply from the corpus-wide mix leaks by skew, so each
    * equivalence class must keep its sensitive distribution within
    * distance t of the global one. The sensitive attribute
    * (market segment) is categorical, for which the paper's EMD under
    * the equal-distance ground metric reduces to total variation:
    *   EMD_c = ½ Σ_v |p_c(v) − q(v)|.
    * Every term is kept EXACT by cross-multiplication —
    * |seg_n·N − g_n·n_c| over the common denominator n_c·N — so the
    * audit reports the distance as an integer rational
    * (emd_num / emd_den) plus one quantized double, and the t ≤ 0.2
    * gate is the integer comparison 5·emd_num ≤ emd_den (no float ever
    * decides a release). Products are count×count ≤ N²: exact in a
    * long to N ≈ 3e9 customers; a 100 TB deployment lifts the two
    * multiplies to DECIMAL(38,0) — same shape.
    * Distributed shape: one (QI × segment) hash aggregate (QI-domain
    * bounded, same size at any corpus), the 5-row global mix broadcast
    * onto the bounded class×segment grid built with a cross join, and
    * a left join so segments ABSENT from a class still contribute
    * |0 − g_n·n_c| — dropping them understates the distance exactly
    * when the class is most skewed. */
  def qTcloseness(s: SparkSession, d: String): DataFrame = {
    val perSeg = customer(s, d)
      .groupBy(
        col("c_nationkey").cast("long").as("nation"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bucket"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("seg_n"))
    val global = perSeg.groupBy("segment").agg(sum("seg_n").as("g_n"))
      .crossJoin(broadcast(
        perSeg.agg(sum("seg_n").as("big_n"))))
    val classes = perSeg.groupBy("nation", "bal_bucket")
      .agg(sum("seg_n").as("n_c"))
    classes
      .crossJoin(broadcast(global))
      .join(perSeg, Seq("nation", "bal_bucket", "segment"), "left")
      // Deliberate exact-integer cross-multiplication (the t-closeness
      // gate must not misclassify a class sitting exactly at t): each
      // factor ≤ big_n, so every product ≤ big_n² and the longs are
      // exact while big_n < 2³¹·⁵ ≈ 3.04×10⁹ customers. Past that,
      // consume the double `emd` column with a quantized threshold
      // instead of the exact gate — the bound is structural (a 2⁶³
      // wrap), not a fixture artifact.
      .withColumn("term",
        abs(coalesce(col("seg_n"), lit(0L)) * col("big_n") -
          col("g_n") * col("n_c")))
      .groupBy("nation", "bal_bucket")
      .agg(
        max("n_c").as("n"),
        sum("term").as("emd_num"),
        (lit(2L) * max("n_c") * max("big_n")).as("emd_den"))
      .select(
        col("nation"), col("bal_bucket"), col("n"),
        col("emd_num"), col("emd_den"),
        (floor(col("emd_num").cast("double") * 10000.0 / col("emd_den")
          + 0.5) / 10000.0).as("emd"),
        (col("emd_num") * 5L <= col("emd_den")).cast("int").as("t_close"))
      .orderBy("nation", "bal_bucket")
  }

  /** DuckDB oracle for [[qTcloseness]]: the identical cross-multiplied
    * total-variation EMD, grid built the same way (classes × global
    * segment mix, left join back to observed cells). */
  val tclosenessOracleSql: String =
    """WITH ps AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
      |         c_mktsegment AS segment, COUNT(*) AS seg_n
      |  FROM customer GROUP BY 1, 2, 3),
      |gmix AS (SELECT segment, CAST(SUM(seg_n) AS BIGINT) AS g_n FROM ps GROUP BY 1),
      |tot AS (SELECT CAST(SUM(seg_n) AS BIGINT) AS big_n FROM ps),
      |cls AS (SELECT nation, bal_bucket, CAST(SUM(seg_n) AS BIGINT) AS n_c
      |        FROM ps GROUP BY 1, 2),
      |grid AS (
      |  SELECT cls.nation, cls.bal_bucket, cls.n_c, gmix.segment, gmix.g_n,
      |         tot.big_n, COALESCE(ps.seg_n, 0) AS seg_n
      |  FROM cls CROSS JOIN gmix CROSS JOIN tot
      |  LEFT JOIN ps ON ps.nation = cls.nation
      |    AND ps.bal_bucket = cls.bal_bucket AND ps.segment = gmix.segment)
      |SELECT nation, bal_bucket, MAX(n_c) AS n,
      |       CAST(SUM(ABS(seg_n * big_n - g_n * n_c)) AS BIGINT) AS emd_num,
      |       CAST(2 * MAX(n_c) * MAX(big_n) AS BIGINT) AS emd_den,
      |       FLOOR(CAST(SUM(ABS(seg_n * big_n - g_n * n_c)) AS DOUBLE)
      |             * 10000.0 / (2 * MAX(n_c) * MAX(big_n)) + 0.5) / 10000.0
      |         AS emd,
      |       CAST(SUM(ABS(seg_n * big_n - g_n * n_c)) * 5
      |            <= 2 * MAX(n_c) * MAX(big_n) AS INTEGER) AS t_close
      |FROM grid GROUP BY nation, bal_bucket
      |ORDER BY nation, bal_bucket""".stripMargin

  /** Additive Holt–Winters triple exponential smoothing (α = ½,
    * β = ¼, γ = ¼, period 7) of each event type's daily total — the
    * seasonal rung above [[qHoltLinear]]: level + trend + a rotating
    * 7-slot seasonal state, the forecaster that stops a weekly cycle
    * from masquerading as trend drift. Same execution contract as
    * Holt linear: the fact table collapses to exact-integer daily
    * cents first (the only corpus-sized shuffle), and the inherently
    * sequential recurrence folds ONE `aggregate()` lambda over the
    * per-type calendar-bounded sorted array — no driver loop,
    * parallel across types. Init (classic two-period): l₀ = week-1
    * mean, b₀ = (week-2 mean − week-1 mean)/7, s_i = v_i − l₀;
    * smoothing runs from t = 8 with
    *   l′ = α(v − s_old) + (1−α)(l + b),
    *   b′ = β(l′ − l) + (1−β)b,
    *   s′ = γ(v − l′) + (1−γ)s_old,
    * the seasonal slot rotating (pos mod 7) + 1. Every operand chain
    * is the same IEEE expression tree in the same order on both
    * engines (the oracle repeats the l′ subexpression exactly as
    * [[qHoltLinear]]'s does), so the unrounded state matches
    * bit-for-bit; only the final report quantizes. Output: final
    * level/trend, the 7-slot seasonal profile, and the 1-day-ahead
    * forecast l′ + b′ + s[next]. */
  def qHoltWinters(s: SparkSession, d: String): DataFrame = {
    def r4(x: Column): Column = floor(x * 10000.0 + 0.5) / 10000.0
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)")).as("cents"))
      .select(col("event_type"), col("day"),
        (col("cents").cast("double") / 100.0).as("v"))
    def vAt(i: Int): Column = col("xs")(i)("v")
    val st = daily.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("day"), col("v")))).as("xs"))
      .filter(size(col("xs")) >= 15)
      .withColumn("n_days", size(col("xs")).cast("long"))
      .withColumn("w1",
        vAt(0) + vAt(1) + vAt(2) + vAt(3) + vAt(4) + vAt(5) + vAt(6))
      .withColumn("w2",
        vAt(7) + vAt(8) + vAt(9) + vAt(10) + vAt(11) + vAt(12) + vAt(13))
      .withColumn("l0", col("w1") / 7.0)
      .withColumn("b0", (col("w2") - col("w1")) / 49.0)
      .withColumn("s0",
        transform(slice(col("xs"), 1, 7), x => x("v") - col("l0")))
      .withColumn("fin", aggregate(
        slice(col("xs"), lit(8), size(col("xs")) - 7),
        struct(col("l0").as("lvl"), col("b0").as("trd"),
          col("s0").as("s"), lit(1).as("pos")),
        (acc, x) => {
          val sOld = element_at(acc("s"), acc("pos"))
          val lvl2 = lit(0.5) * (x("v") - sOld) +
            lit(0.5) * (acc("lvl") + acc("trd"))
          val trd2 = lit(0.25) * (lvl2 - acc("lvl")) + lit(0.75) * acc("trd")
          val sNew = lit(0.25) * (x("v") - lvl2) + lit(0.75) * sOld
          struct(lvl2.as("lvl"), trd2.as("trd"),
            concat(slice(acc("s"), lit(1), acc("pos") - 1), array(sNew),
              slice(acc("s"), acc("pos") + 1, lit(7) - acc("pos"))).as("s"),
            ((acc("pos") % 7) + 1).as("pos"))
        }))
    st.select(col("event_type"), col("n_days"),
        r4(col("fin")("lvl")).as("level"),
        r4(col("fin")("trd")).as("trend"),
        r4(element_at(col("fin")("s"), lit(1))).as("s1"),
        r4(element_at(col("fin")("s"), lit(2))).as("s2"),
        r4(element_at(col("fin")("s"), lit(3))).as("s3"),
        r4(element_at(col("fin")("s"), lit(4))).as("s4"),
        r4(element_at(col("fin")("s"), lit(5))).as("s5"),
        r4(element_at(col("fin")("s"), lit(6))).as("s6"),
        r4(element_at(col("fin")("s"), lit(7))).as("s7"),
        r4(col("fin")("lvl") + col("fin")("trd") +
          element_at(col("fin")("s"), col("fin")("pos"))).as("forecast_1d"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[qHoltWinters]]: the identical recurrence as a
    * recursive CTE carrying the rotating 7-slot seasonal list, the l′
    * subexpression repeated verbatim where the lambda reuses it (an
    * identical IEEE tree evaluates identically, repeated or not). */
  val holtWintersOracleSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |         CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |           / 100.0 AS v
      |  FROM events GROUP BY 1, 2),
      |arr AS (SELECT event_type, list(v ORDER BY day) AS xs
      |        FROM daily GROUP BY 1),
      |base AS (
      |  SELECT event_type, xs, CAST(len(xs) AS BIGINT) AS n,
      |         xs[1]+xs[2]+xs[3]+xs[4]+xs[5]+xs[6]+xs[7] AS w1,
      |         xs[8]+xs[9]+xs[10]+xs[11]+xs[12]+xs[13]+xs[14] AS w2
      |  FROM arr WHERE len(xs) >= 15),
      |init AS (
      |  SELECT event_type, xs, n, w1 / 7.0 AS lvl, (w2 - w1) / 49.0 AS trd,
      |         list_transform(xs[1:7], x -> x - w1 / 7.0) AS s
      |  FROM base),
      |r(event_type, xs, n, idx, lvl, trd, s, pos) AS (
      |  SELECT event_type, xs, n, CAST(8 AS BIGINT), lvl, trd, s, 1 FROM init
      |  UNION ALL
      |  SELECT event_type, xs, n, idx + 1,
      |         0.5 * (xs[idx] - s[pos]) + 0.5 * (lvl + trd),
      |         0.25 * ((0.5 * (xs[idx] - s[pos]) + 0.5 * (lvl + trd)) - lvl)
      |           + 0.75 * trd,
      |         s[1:pos-1]
      |           || [0.25 * (xs[idx]
      |                - (0.5 * (xs[idx] - s[pos]) + 0.5 * (lvl + trd)))
      |               + 0.75 * s[pos]]
      |           || s[pos+1:7],
      |         (pos % 7) + 1
      |  FROM r WHERE idx <= n)
      |SELECT event_type, n AS n_days,
      |       FLOOR(lvl * 10000.0 + 0.5) / 10000.0 AS level,
      |       FLOOR(trd * 10000.0 + 0.5) / 10000.0 AS trend,
      |       FLOOR(s[1] * 10000.0 + 0.5) / 10000.0 AS s1,
      |       FLOOR(s[2] * 10000.0 + 0.5) / 10000.0 AS s2,
      |       FLOOR(s[3] * 10000.0 + 0.5) / 10000.0 AS s3,
      |       FLOOR(s[4] * 10000.0 + 0.5) / 10000.0 AS s4,
      |       FLOOR(s[5] * 10000.0 + 0.5) / 10000.0 AS s5,
      |       FLOOR(s[6] * 10000.0 + 0.5) / 10000.0 AS s6,
      |       FLOOR(s[7] * 10000.0 + 0.5) / 10000.0 AS s7,
      |       FLOOR((lvl + trd + s[pos]) * 10000.0 + 0.5) / 10000.0
      |         AS forecast_1d
      |FROM r WHERE idx = n + 1 ORDER BY event_type""".stripMargin
}
