package graft

import graft.engine.{AnalyticsOps, CurationOps, RelationalExt, StatsOps}
import org.apache.spark.sql.functions._

/** Semantic checks for the round-6 statistics/graph/curation batch
  * (the DuckDB differential at sf0.01 is the primary gate). */
class StatsMoreSpec extends SparkSuite {

  test("ewma: first event per user equals its own value; weights renormalize") {
    val rows = StatsOps.qEwma(spark, sf)
    // rows whose user-sequence position is 1 have ewma == value
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
    val firsts = rows.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .filter(abs(col("ewma") - col("value")) > 0.01)
    assert(firsts.count() == 0, "first-in-sequence ewma must equal value")
    assert(rows.count() == graft.engine.Tables.events(spark, sf).count())
  }

  test("mad: nonnegative and below the value range; one row per event type") {
    val rows = StatsOps.qMad(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (mad, med) = (r.getDouble(3), r.getDouble(2))
      assert(mad >= 0 && mad <= 500, s"mad out of range: $r")
      assert(med >= 0 && med <= 500, s"median out of range: $r")
    }
  }

  test("benford: shares sum to 1, digits 1-9, expectation decreasing") {
    val rows = StatsOps.qBenford(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq.sorted ==
      rows.map(_.getString(0)).toSeq, "ordered by digit")
    assert(rows.forall(r => r.getString(0) >= "1" && r.getString(0) <= "9"))
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 0.001, s"shares sum $shareSum")
    val exp = rows.map(_.getDouble(3))
    assert(exp.zip(exp.tail).forall { case (a, b) => a >= b },
      "benford expectation must decrease with digit")
  }

  test("ab test: one row, counts consistent, z finite") {
    val r = StatsOps.qAbTest(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) <= row.getLong(0), "conversions <= trials (click)")
    assert(row.getLong(3) <= row.getLong(2), "conversions <= trials (view)")
    assert(!row.getDouble(6).isNaN && !row.getDouble(6).isInfinite)
  }

  test("pagerank iteration: rank above the damping floor and top-100 sorted") {
    val rows = RelationalExt.qPagerankIter(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // fixed-point: 3e6 ppm-scaled floor (= 0.15 damping), integer exact
    rows.foreach(r => assert(r.getLong(2) >= 3000000L, s"below damping floor: $r"))
    val pr = rows.map(_.getLong(2))
    assert(pr.zip(pr.tail).forall { case (a, b) => a >= b }, "sorted desc")
  }

  test("time to event: non-negative micros, users have both events") {
    val rows = AnalyticsOps.qTimeToEvent(spark, sf)
    assert(rows.filter(col("micros_to_convert") < 0).count() == 0)
    // every returned user really has both a signup and a purchase
    val e = graft.engine.Tables.events(spark, sf)
    val both = e.filter(col("event_type") === "signup").select("user_id").distinct()
      .intersect(e.filter(col("event_type") === "purchase").select("user_id").distinct())
    val bad = rows.select("user_id").except(both)
    assert(bad.count() == 0)
  }

  test("term drift: support filter holds and output bounded") {
    val rows = CurationOps.qTermDrift(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach(r => assert(r.getLong(1) + r.getLong(2) >= 10, s"support: $r"))
  }
}
