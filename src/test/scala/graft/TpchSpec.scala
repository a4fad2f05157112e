package graft

import graft.engine.{Tables, TpchOps}

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

  test("Q4: late-ship EXISTS counts every priority, semi-join plan") {
    val df = TpchOps.qTpchQ4(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi join:\n${plan.take(1200)}")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) > 0))
  }

  test("Q7: bidirectional nation-pair revenue, years within window") {
    val rows = TpchOps.qTpchQ7(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set("NATION_12", "NATION_10")(r.getString(0)))
      assert(r.getLong(2) == 1996L || r.getLong(2) == 1997L)
    }
  }

  test("Q8: market share is a valid fraction per year") {
    val rows = TpchOps.qTpchQ8(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("Q13: order-count distribution conserves total customers") {
    val rows = TpchOps.qTpchQ13(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val nCust = Tables.customer(spark, sf).count()
    assert(total == nCust, s"distribution covers $total of $nCust customers")
  }

  test("Q15: all returned suppliers share the identical max revenue") {
    val rows = TpchOps.qTpchQ15(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getDouble(2)).distinct.length == 1)
  }

  test("Q17: quantity threshold keeps only sub-20%-of-average lines") {
    val rows = TpchOps.qTpchQ17(spark, sf).collect()
    assert(rows.length == 1 && rows.head.getLong(1) > 0)
  }

  test("Q18: sum_qty above threshold, ordered by totalprice desc") {
    val rows = TpchOps.qTpchQ18(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(5) > 300))
    val tp = rows.map(_.getDouble(4))
    assert(tp.zip(tp.tail).forall { case (a, b) => a >= b })
  }

  test("Q22: dormant high-balance customers grouped by nation") {
    val rows = TpchOps.qTpchQ22(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) > 0))
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

  test("Q2: each part's winners all quote that part's minimum cost") {
    val rows = TpchOps.qTpchQ2(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // one distinct cost per partkey (the correlated-min contract)
    val perPart = rows.groupBy(_.getLong(3)).values
    assert(perPart.forall(_.map(_.getDouble(5)).distinct.length == 1))
    val bal = rows.map(_.getDouble(0))
    assert(bal.zip(bal.tail).forall { case (a, b) => a >= b }, "acctbal desc")
  }

  test("Q11: every kept part clears the integer 1/10000 threshold") {
    val rows = TpchOps.qTpchQ11(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) > 0))
    val vals = rows.map(_.getDouble(1))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b }, "value desc")
  }

  test("Q12: high+low per class equals the class's late-line count") {
    val rows = TpchOps.qTpchQ12(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 2)
    rows.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(2) >= 0
      && r.getLong(1) + r.getLong(2) > 0))
  }

  test("Q16: distinct-supplier counts bounded by the supplier table") {
    val nSupp = Tables.supplier(spark, sf).count()
    val rows = TpchOps.qTpchQ16(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) >= 1 && r.getLong(3) <= nSupp))
    val cnts = rows.map(_.getLong(3))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "cnt desc")
  }

  test("Q20: dominant suppliers are a strict subset of all suppliers") {
    val rows = TpchOps.qTpchQ20(spark, sf).collect()
    val nSupp = Tables.supplier(spark, sf).count()
    assert(rows.length < nSupp, "the >=5-competitor guard must prune")
    val names = rows.map(_.getString(0))
    assert(names.sorted.sameElements(names), "ordered by s_name")
    assert(names.distinct.length == names.length, "IN-subquery dedups")
  }

  test("Q21: numwait desc top-20, anti-join leaves sole-latest shippers") {
    val df = TpchOps.qTpchQ21(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") || plan.contains("ExistenceJoin"),
      s"expected a semi/existence join:\n${plan.take(1200)}")
    assert(plan.contains("LeftAnti"),
      s"expected an anti join:\n${plan.take(1200)}")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val w = rows.map(_.getLong(1))
    assert(w.zip(w.tail).forall { case (a, b) => a >= b }, "numwait desc")
  }
}
