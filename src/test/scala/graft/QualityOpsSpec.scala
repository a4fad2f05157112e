package graft

import graft.engine.QualityOps

/** Data-quality audit suite semantics (DuckDB differential is the
  * value gate; these pin report shapes and known fixture facts). */
class QualityOpsSpec extends SparkSuite {

  test("fk audit: both edges checked, orphan count <= checked count") {
    val rows = QualityOps.qFkAudit(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("lineitem->orders", "orders->customer"))
    rows.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(2)))
  }

  test("key uniqueness: single-column keys unique; lineitem pair documented non-unique") {
    val m = QualityOps.qKeyUniqueness(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m("customer.c_custkey")._2 == 0, "customer key must be unique")
    assert(m("orders.o_orderkey")._2 == 0, "orders key must be unique")
    // the fixture's known quirk (verify-skill gotcha): the pair is NOT unique
    val (_, dupKeys, dupRows) = m("lineitem.(l_orderkey,l_linenumber)")
    assert(dupRows >= dupKeys, "dup rows cover dup keys")
  }

  test("null profile: one row per column, counts bounded by row count") {
    val rows = QualityOps.qNullProfile(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(3) && r.getLong(2) <= r.getLong(3))
    }
  }

  test("range audit: five rules, violations bounded") {
    val rows = QualityOps.qRangeAudit(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(2)))
  }

  test("order reconcile: buckets partition the order book") {
    val rows = QualityOps.qOrderReconcile(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.engine.Tables.orders(spark, sf).count(),
      "every order lands in exactly one bucket")
  }

  test("freshness: lag is non-negative and zero for the freshest type") {
    val rows = QualityOps.qFreshness(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(2) >= 0))
    assert(rows.exists(_.getLong(2) == 0), "some type holds the high-water mark")
  }
}
