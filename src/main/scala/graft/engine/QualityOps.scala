package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audit operators — the validation layer a training-data
  * pipeline runs over raw tables before anything downstream trusts
  * them: referential integrity, key uniqueness, null/blank profiling,
  * domain-range checks, cross-table reconciliation, and freshness.
  * The reference ships no quality surface at all; these are the
  * checks its buffered streams would need before the relational sink
  * is queryable in anger.
  *
  * Scale shape: every audit is either an anti-join on the natural key
  * (shuffle bounded by key cardinality), a single conditional-
  * aggregation scan, or a keyed two-table aggregate join — nothing
  * quadratic, nothing driver-side. */
object QualityOps {
  import Tables._

  /** Referential-integrity audit: orphan counts along the fact→dim
    * chain (lineitem→orders, orders→customer), one left join +
    * conditional aggregate per edge. One row per checked edge with
    * the orphan count and the checked row count — the shape a
    * quality dashboard ingests. */
  def qFkAudit(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val o = orders(s, d)
    val c = customer(s, d)
    // ONE pass per edge: a left join marks orphans (null dim key) and
    // a single conditional aggregate yields both counts — a separate
    // anti-join + count would scan the fact table twice
    def audit(name: String, fact: DataFrame, key: String,
              dim: DataFrame, dimKey: String): DataFrame =
      fact.join(
          dim.select(col(dimKey).as(key)).distinct().withColumn("_hit", lit(1)),
          Seq(key), "left")
        .agg(
          sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("n_orphans"),
          count(lit(1)).as("n_checked"))
        .select(lit(name).as("fk_edge"), col("n_orphans"), col("n_checked"))
    audit("lineitem->orders", li.select(col("l_orderkey").as("o_orderkey")),
        "o_orderkey", o, "o_orderkey")
      .unionByName(audit("orders->customer",
        o.select(col("o_custkey").as("c_custkey")), "c_custkey", c, "c_custkey"))
      .orderBy("fk_edge")
  }

  /** Key-uniqueness audit: for each candidate key, how many key values
    * occur more than once and how many rows sit in those duplicate
    * groups. One groupBy per key (shuffle on the key), aggregated to
    * a 3-row report. The (l_orderkey, l_linenumber) row documents a
    * KNOWN fixture quirk: the pair is not unique. */
  def qKeyUniqueness(s: SparkSession, d: String): DataFrame = {
    def audit(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
        .agg(
          count(lit(1)).as("n_keys"),
          sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
          sum(when(col("n") > 1, col("n")).otherwise(0L)).as("n_dup_rows"))
        .select(lit(name).as("key"), col("n_keys"), col("n_dup_keys"), col("n_dup_rows"))
    audit("customer.c_custkey", customer(s, d), Seq("c_custkey"))
      .unionByName(audit("lineitem.(l_orderkey,l_linenumber)",
        lineitem(s, d), Seq("l_orderkey", "l_linenumber")))
      .unionByName(audit("orders.o_orderkey", orders(s, d), Seq("o_orderkey")))
      .orderBy("key")
  }

  /** Null/blank profile of the orders table: one row per column with
    * null and blank counts — ONE conditional-aggregation scan
    * unpivoted to the report shape (never a scan per column). */
  def qNullProfile(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val agg = o.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_null"),
        sum(when(trim(col(c).cast("string")) === "", 1L).otherwise(0L)).as(s"${c}_blank")
      )): _*)
    agg.select(
      explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col(s"${c}_null").as("n_null"),
        col(s"${c}_blank").as("n_blank"),
        col("n_rows").as("n_rows"))): _*)).as("r"))
      .select("r.column", "r.n_null", "r.n_blank", "r.n_rows")
      .orderBy("column")
  }

  /** Domain-range audit over lineitem: count of rows violating each
    * business-range rule — one conditional-aggregation scan, report
    * unpivoted to rule rows. */
  def qRangeAudit(s: SparkSession, d: String): DataFrame = {
    val rules: Seq[(String, Column)] = Seq(
      "quantity in [1,50]" -> (col("l_quantity") < 1 || col("l_quantity") > 50),
      "price > 0"          -> (col("l_extendedprice") <= 0),
      "discount in [0,0.1]"-> (col("l_discount") < 0 || col("l_discount") > 0.1),
      "tax in [0,0.08]"    -> (col("l_tax") < 0 || col("l_tax") > 0.08),
      "ship after 1994"    -> (col("l_shipdate").cast("date") < lit("1995-01-01").cast("date")))
    val agg = lineitem(s, d).agg(
      count(lit(1)).as("n_rows"),
      rules.zipWithIndex.map { case ((_, cond), i) =>
        sum(when(cond, 1L).otherwise(0L)).as(s"v$i")
      }: _*)
    agg.select(
      explode(array(rules.zipWithIndex.map { case ((name, _), i) => struct(
        lit(name).as("rule"),
        col(s"v$i").as("n_violations"),
        col("n_rows").as("n_rows"))
      }: _*)).as("r"))
      .select("r.rule", "r.n_violations", "r.n_rows")
      .orderBy("rule")
  }

  /** Cross-table reconciliation: does o_totalprice equal the order's
    * line total Σ extprice·(1+tax)·(1−disc)? The line total is summed
    * in EXACT integer 10^-6-dollar units (2-decimal price × 2-decimal
    * rates) and every comparison is integer arithmetic, so no bucket
    * can flap on float accumulation dust — a per-order float sum sits
    * exactly on the half-cent boundary whenever the exact total does.
    * Output: match-bucket histogram — the reconciliation report a
    * pipeline alerts on. One keyed aggregate of lineitem + a join. */
  def qOrderReconcile(s: SparkSession, d: String): DataFrame = {
    val lineTotal = lineitem(s, d)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(Tables.moneySumDiscTax(
        col("l_extendedprice"), col("l_discount"), col("l_tax")).as("s6"))
    orders(s, d).join(lineTotal, Seq("o_orderkey"), "left")
      .withColumn("total_cents", round(col("o_totalprice") * 100).cast("long"))
      .withColumn("line_cents", expr("(s6 + 5000) DIV 10000"))
      .select(
        when(col("s6").isNull, "no_lineitems")
          .when(col("total_cents") === col("line_cents"), "exact_cents")
          .when(abs(col("total_cents") * 10000 - col("s6")) <=
            col("total_cents") * 100, "within_1pct")
          .otherwise("mismatch").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_orders"))
      .orderBy("bucket")
  }

  /** Freshness audit: per event type, the lag between its newest event
    * and the stream's global high-water mark, in exact microseconds —
    * the staleness monitor a streaming pipeline pages on. One
    * aggregate + a 1-row broadcast. */
  def qFreshness(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val perType = e.groupBy("event_type")
      .agg(max(unix_micros(col("ts"))).as("newest_us"),
        count(lit(1)).as("n_events"))
    perType
      .crossJoin(broadcast(e.agg(max(unix_micros(col("ts"))).as("hwm_us"))))
      .select(col("event_type"), col("n_events"),
        (col("hwm_us") - col("newest_us")).as("lag_us"))
      .orderBy("event_type")
  }

  /** Data-contract check: the declared table contract (ranges,
    * uniqueness, referential integrity, null policy) evaluated as ONE
    * report — what a pipeline runs before publishing a dataset
    * version, and the composite form of the individual audits above.
    * Each check is a single aggregate over its target (count of
    * violating rows); the FK probe is a broadcast-able anti join.
    * Nothing here is row-preserving, so the report is a fixed-height
    * table regardless of data volume. */
  def qDataContract(s: SparkSession, d: String): DataFrame = {
    def check(name: String, target: String,
              checked: DataFrame, violations: Column): DataFrame =
      checked.agg(count(lit(1)).as("n_checked"),
        sum(violations.cast("long")).as("n_violations"))
        .select(lit(name).as("check_name"), lit(target).as("target"),
          col("n_checked"),
          coalesce(col("n_violations"), lit(0L)).as("n_violations"),
          (coalesce(col("n_violations"), lit(0L)) === 0L).cast("int")
            .as("pass"))
    val o = orders(s, d)
    val li = lineitem(s, d)
    val dupKeys = o.groupBy("o_orderkey").agg(count(lit(1)).as("kn"))
      .select((col("kn") > 1).as("v"))
    val orphans = li.select(col("l_orderkey"))
      .join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .select(lit(true).as("v"))
    check("positive_total", "orders.o_totalprice",
      o.select((col("o_totalprice") <= 0).as("v")), col("v"))
      .unionByName(check("unique_key", "orders.o_orderkey", dupKeys, col("v")))
      .unionByName(check("fk_lineitem_orders", "lineitem.l_orderkey",
        orphans, col("v")))
      .unionByName(check("discount_range", "lineitem.l_discount",
        li.select((col("l_discount") < 0 || col("l_discount") > 1).as("v")),
        col("v")))
      .unionByName(check("acctbal_not_null", "customer.c_acctbal",
        customer(s, d).select(col("c_acctbal").isNull.as("v")), col("v")))
      .orderBy("check_name")
  }

  /** Approximate functional-dependency audit (Kivinen–Mannila g3):
    * for each candidate FD lhs → rhs, the violation rate is the
    * minimum fraction of rows to delete so the dependency holds —
    * 1 − Σ_lhs max-class / N. The profiling primitive schema-discovery
    * tools (Tane/Metanome lineage) run before trusting a key: here it
    * separates a real key (o_orderkey → o_custkey, rate 0) from
    * near-FDs the fixture violates. Per candidate: one
    * (lhs, rhs)-count aggregate, then an lhs-level max/sum collapse,
    * then a 1-row summary — two map-side-combinable shuffles each,
    * no windows, so the audit runs at fact-table scale; the three
    * 1-row summaries union on the driver plan. */
  def qFdAudit(s: SparkSession, d: String): DataFrame = {
    def g3(df: DataFrame, fdName: String, lhs: String, rhs: String): DataFrame =
      df.groupBy(col(lhs).as("lhs"), col(rhs).as("rhs"))
        .agg(count(lit(1)).as("c"))
        .groupBy("lhs")
        .agg(sum("c").as("n"), max("c").as("mx"),
          count(lit(1)).as("n_rhs"))
        .agg(
          count(lit(1)).as("lhs_groups"),
          sum((col("n_rhs") > 1).cast("long")).as("violating_groups"),
          sum("n").as("n_rows"),
          sum(col("n") - col("mx")).as("min_deletes"))
        .select(lit(fdName).as("fd"),
          col("lhs_groups"), col("violating_groups"), col("n_rows"),
          round(col("min_deletes").cast("double") / col("n_rows"), 6)
            .as("g3_rate"),
          (col("violating_groups") === 0L).cast("int").as("holds"))
    g3(orders(s, d), "o_orderkey->o_custkey", "o_orderkey", "o_custkey")
      .unionByName(g3(orders(s, d), "o_custkey->o_orderpriority",
        "o_custkey", "o_orderpriority"))
      .unionByName(g3(lineitem(s, d), "l_partkey->l_suppkey",
        "l_partkey", "l_suppkey"))
      .orderBy("fd")
  }

  /** Event-time lateness audit — the measurement that SIZES a
    * streaming watermark before anyone picks "1 hour": treating
    * event_id as arrival order, an event is late when its event time
    * sits behind the per-user running maximum; the gap (in exact
    * integer µs) is how much watermark delay would have been needed
    * to keep it. The fixture stream arrives perfectly ordered, so —
    * like q_pii_redact's synthetic PII — a DETERMINISTIC arrival
    * jitter derived from event_id (0–13.5 min back-shift, identical
    * in both engines) supplies the disorder; the audit itself is the
    * production operator. One window pass over the user-keyed
    * stream, µs integers end to end — no float, no timestamp
    * arithmetic ambiguity. Users with zero disorder are dropped (the
    * report is the exception list). */
  def qLatenessAudit(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    events(s, d)
      .select(col("user_id"), col("event_id"),
        (unix_micros(col("ts")) - (col("event_id") % 10) * 90000000L).as("us"))
      .withColumn("late_us",
        greatest(lit(0L),
          coalesce(max("us").over(w), col("us")) - col("us")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum((col("late_us") > 0).cast("long")).as("n_late"),
        max("late_us").as("max_late_us"),
        sum("late_us").as("total_late_us"))
      .filter(col("n_late") > 0)
      .orderBy("user_id")
  }
}
