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
}
