package graft

import graft.engine.{CurationOps, RelationalExt, VectorOps}

/** Semantic checks for PMI collocations, vector quantization, and
  * triangle counting. */
class CurationMoreSpec extends SparkSuite {

  test("pmi rows respect min support and are rank-ordered") {
    val rows = CurationOps.qPmi(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach(r => assert(r.getLong(1) >= 5, s"support violated: $r"))
    val ps = rows.map(_.getDouble(2))
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
  }

  test("vector quantization reconstruction error is small relative to the norm") {
    val q = VectorOps.qVectorQuantize(spark, sf).collect()
    val norms = VectorOps.qVectorNorm(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    q.foreach { r =>
      val (id, dims, err) = (r.getLong(0), r.getLong(1), r.getDouble(4))
      assert(dims == 64)
      // int8 symmetric quantization: per-dim error ≤ maxAbs/254,
      // so L2 err ≤ sqrt(dims)·maxAbs/254 — and far below the norm
      val bound = math.sqrt(dims.toDouble) * r.getDouble(2) / 254.0 + 1e-9
      assert(err <= bound, s"vec $id err $err above bound $bound")
      assert(err < norms(id) * 0.05, s"vec $id err $err not << norm ${norms(id)}")
    }
  }

  test("triangles are canonical and every edge pair has support >= 2") {
    val tri = RelationalExt.qTriangleCount(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    tri.foreach { case (a, b, c) => assert(a < b && b < c) }
    assert(tri.distinct.length == tri.length, "each triangle exactly once")
  }

  test("vocab-sized tables join WITHOUT a broadcast hint (bm25 df, pmi unigrams)") {
    // A broadcast() on a vocabulary-sized side is an OOM at 100 TB; the
    // hint must be absent from the LOGICAL plan (AQE may still pick a
    // broadcast strategy at this sf — that's fine, it's size-driven).
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedHint}
    def hintCount(p: LogicalPlan): Int =
      p.collect { case h: UnresolvedHint => h }.size
    // qBm25: only the 1-row corpus-stats crossJoin may carry a hint
    val bm25Hints = hintCount(
      graft.engine.TextOps.qBm25(spark, sf).queryExecution.logical)
    assert(bm25Hints <= 1, s"qBm25 has $bm25Hints broadcast hints; only the 1-row stats crossJoin is allowed")
    // qPmi: only the two 1-row total crossJoins may carry hints
    val pmiHints = hintCount(
      CurationOps.qPmi(spark, sf).queryExecution.logical)
    assert(pmiHints <= 2, s"qPmi has $pmiHints broadcast hints; only the two 1-row total crossJoins are allowed")
  }

  test("basket-size skew valve is inert on the fixture (property: output stable)") {
    // MaxBasketSize bounds pair fan-out per order; TPC-H orders hold ≤7
    // items so the valve must not change fixture output.
    import org.apache.spark.sql.functions._
    val li = graft.engine.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct()
    val maxBasket = li.groupBy("l_orderkey").count()
      .agg(max("count")).first().getLong(0)
    assert(maxBasket <= RelationalExt.MaxBasketSize,
      s"fixture basket $maxBasket exceeds valve ${RelationalExt.MaxBasketSize} — valve would alter output")
    assert(RelationalExt.MaxBasketSize == 120, "documented constant")
  }
}
