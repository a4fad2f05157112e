package graft

import graft.engine.{AnalyticsOps, Relational, StreamingOps, TextOps}
import org.apache.spark.sql.functions._

/** Semantic checks for the round-3 analytics/relational additions —
  * each pins the property the DuckDB oracle can't express directly
  * (internal consistency, plan shape, streaming parity). */
class AnalyticsSpec extends SparkSuite {

  test("funnel stages are monotonically non-increasing and ordered") {
    val rows = AnalyticsOps.qFunnel(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val ns = rows.map(_.getLong(2))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2),
      s"funnel must narrow: ${ns.toSeq}")
  }

  test("cumulative distinct users ends at the total distinct user count") {
    val r = AnalyticsOps.qCumulativeDistinct(spark, sf).collect()
    val total = graft.engine.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(r.last.getLong(2) == total)
    // running sum is strictly increasing and matches its own n_new
    assert(r.map(_.getLong(1)).sum == total)
  }

  test("cdc upsert drops keys whose latest change is a delete marker") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.engine.Tables.events(spark, sf)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val lastOp = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val deleted = lastOp.filter(col("event_type") === "error")
      .select("user_id").collect().map(_.getLong(0)).toSet
    val surviving = AnalyticsOps.qCdcUpsert(spark, sf)
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(deleted.intersect(surviving).isEmpty,
      s"tombstoned keys leaked: ${deleted.intersect(surviving).take(5)}")
    assert(surviving.size + deleted.size ==
      ev.select("user_id").distinct().count())
  }

  test("map funcs: per-user map agrees with a direct count") {
    val ev = graft.engine.Tables.events(spark, sf)
    val direct = ev.filter(col("event_type") === "click")
      .groupBy("user_id").agg(count(lit(1)).as("n_direct"))
    val viaMap = AnalyticsOps.qMapFuncs(spark, sf)
      .select("user_id", "n_click")
    val mismatches = viaMap.join(direct, Seq("user_id"), "left")
      .filter(coalesce(col("n_direct"), lit(0L)) =!= col("n_click"))
      .count()
    assert(mismatches == 0)
  }

  test("grouping_id levels partition the cube output") {
    val r = Relational.qGroupingId(spark, sf)
    val table = graft.engine.Tables.lineitem(spark, sf).count()
    // gid=3 is the grand total (both columns rolled up)
    val grand = r.filter(col("gid") === 3).collect()
    assert(grand.length == 1 && grand(0).getLong(3) == table)
    // each gid level's counts re-sum to the full table
    r.groupBy("gid").agg(sum("n").as("s")).collect()
      .foreach(row => assert(row.getLong(1) == table,
        s"gid=${row.get(0)} sums to ${row.getLong(1)}, not $table"))
  }

  test("setops_all: EXCEPT ALL keeps multiplicity-minus-one per ordering customer") {
    val orders = graft.engine.Tables.orders(spark, sf)
    val exceptRows = Relational.qSetOpsAll(spark, sf)
      .filter(col("kind") === "except_all")
      .agg(sum("n")).collect()(0).getLong(0)
    val nOrders = orders.count()
    val nOrderingCusts = orders.select("o_custkey").distinct().count()
    assert(exceptRows == nOrders - nOrderingCusts,
      s"EXCEPT ALL total $exceptRows != $nOrders - $nOrderingCusts")
  }

  test("range frame: same-day peers share one frame value") {
    val r = Relational.qWindowRangeFrame(spark, sf)
    val o = graft.engine.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey").as("ck"),
        to_date(col("o_orderdate")).as("day"))
    // rows with identical (custkey, day) must have identical frame
    // aggregates — RANGE includes all peers, unlike ROWS
    val joined = r.join(o, "o_orderkey")
    val distinctPerPeer = joined.groupBy("ck", "day")
      .agg(countDistinct("range_sum_30d").as("nv"))
      .filter(col("nv") > 1).count()
    assert(distinctPerPeer == 0)
  }

  test("posexplode positions are dense 0..n-1 prefixes") {
    val r = TextOps.qPosexplode(spark, sf)
    val bad = r.groupBy("doc_id")
      .agg(min("pos").as("lo"), max("pos").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1)
      .count()
    assert(bad == 0)
    assert(r.agg(max("pos")).collect()(0).getLong(0) <= 9)
  }

  test("char ngrams are all length 3 and capped at 30") {
    val rows = TextOps.qCharNgram(spark, sf).collect()
    assert(rows.length <= 30)
    assert(rows.forall(_.getString(0).length == 3))
  }

  test("stream outer join preserves every click and agrees with the inner join") {
    val outer = StreamingOps.qStreamOuterJoin(spark, sf)
    val nClicks = graft.engine.Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(outer.select("click_id").distinct().count() == nClicks)
    val innerFromOuter = outer.filter(col("purchase_id") =!= -1L)
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inner = StreamingOps.qStreamJoin(spark, sf)
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(innerFromOuter == inner)
  }

  test("decimal charge agrees with the double pipeline to fp tolerance") {
    val dec = Relational.qDecimalArith(spark, sf)
      .select("l_returnflag", "total_charge").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dbl = graft.engine.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * (lit(1.0) + col("l_tax"))).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    dec.foreach { case (k, v) =>
      assert(math.abs(v - dbl(k)) < 1.0, s"$k: decimal $v vs double ${dbl(k)}")
    }
  }

  test("cross join plans as broadcast nested loop (tiny dims)") {
    val plan = Relational.qCrossJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast nested loop for 5x25 cartesian:\n$plan")
  }

  test("higher-order funcs stay shuffle-free before the output sort") {
    val plan = TextOps.qHigherOrderFuncs(spark, sf)
      .queryExecution.executedPlan.toString
    // the only exchange is the rangepartitioning for ORDER BY — the
    // per-doc array work itself must not shuffle (no hashpartitioning)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"per-row HOFs must not hash-shuffle:\n$plan")
  }

  test("setops_all avoids nested-loop joins (aggregate-based multiset ops)") {
    val plan = Relational.qSetOpsAll(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"EXCEPT/INTERSECT ALL must not plan a product join:\n$plan")
  }

  test("argmax returns the keys of the actual extremes") {
    val o = graft.engine.Tables.orders(spark, sf)
    val r = Relational.qArgmax(spark, sf).collect()
    r.foreach { row =>
      val status = row.getString(0)
      val maxPrice = row.getDouble(3)
      val claimed = row.getLong(1)
      val actual = o.filter(col("o_orderstatus") === status)
        .filter(round(col("o_totalprice"), 2) === maxPrice)
        .agg(max("o_orderkey")).collect()(0).getLong(0)
      assert(claimed == actual, s"$status: max_by gave $claimed, expected $actual")
    }
  }
}
