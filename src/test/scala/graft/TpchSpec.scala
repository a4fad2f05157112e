package graft

import graft.engine.TpchOps

/** The spark.sql interface path: TPC-H-shaped queries over temp views,
  * with plan-shape assertions (the DuckDB differential is the value
  * gate). */
class TpchSpec extends SparkSuite {

  test("Q1: 4 groups, positive sums, ordered by flag/status") {
    val rows = TpchOps.qTpchQ1(spark, sf).collect()
    assert(rows.length >= 3 && rows.length <= 6)
    rows.foreach { r =>
      assert(r.getLong(2) > 0 && r.getDouble(3) > 0 && r.getLong(9) > 0)
      assert(r.getDouble(4) <= r.getDouble(5),
        "disc price must not exceed charge (tax >= 0)")
    }
  }

  test("Q6: date + discount predicates reach the parquet scan (pushdown)") {
    val plan = TpchOps.qTpchQ6(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      (plan.contains("GreaterThanOrEqual(l_shipdate") || plan.contains("IsNotNull(l_discount")),
      s"expected pushed scan filters in:\n${plan.take(1500)}")
  }

  test("Q3: top-10 via TakeOrderedAndProject, never a global sort") {
    val plan = TpchOps.qTpchQ3(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n${plan.take(1500)}")
    val rows = TpchOps.qTpchQ3(spark, sf).collect()
    assert(rows.length <= 10)
    val rev = rows.map(_.getDouble(1))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b }, "revenue desc")
  }
}
